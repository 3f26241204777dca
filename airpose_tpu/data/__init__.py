from .synthetic import batch_slice, make_synthetic_dataset

__all__ = ["batch_slice", "make_synthetic_dataset"]
