from .trilinear import trilinear_sample  # noqa: F401
