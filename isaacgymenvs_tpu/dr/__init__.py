from .randomize import DomainRandomizer, DRSpec  # noqa: F401
from .adr import ADR, AdrState  # noqa: F401
from .param_generator import (  # noqa: F401
    FullCovarianceParamGenerator,
    MixtureParamGenerator,
)
