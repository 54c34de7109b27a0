from .builder import SdfGrid, mesh_to_sdf, sdf_gradient, sdf_query  # noqa: F401
