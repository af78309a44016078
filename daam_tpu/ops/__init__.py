from .resize import bicubic_resize, resize_weight_matrix  # noqa: F401
