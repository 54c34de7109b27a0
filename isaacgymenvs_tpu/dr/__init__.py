from .randomize import DomainRandomizer, DRSpec  # noqa: F401
