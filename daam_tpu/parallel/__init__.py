from .mesh import (make_mesh, use_mesh, get_active_mesh, constraint,
                   replicate_params, generate_batch)  # noqa: F401
