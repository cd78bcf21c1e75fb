from .residuals import (
    difference_residuals,
    error_residuals,
    internal_norm,
    scaled_error_norm,
    sde_error_residuals,
)

__all__ = [
    "difference_residuals",
    "error_residuals",
    "internal_norm",
    "scaled_error_norm",
    "sde_error_residuals",
]
