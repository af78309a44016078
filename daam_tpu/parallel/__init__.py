from .mesh import (make_mesh, use_mesh, get_active_mesh, constraint,
                   replicate_params, generate_batch, fetch_global)  # noqa: F401
from .distributed import (init_distributed, make_global_mesh,  # noqa: F401
                          is_multi_process)
