from . import cluster, profiling, render

__all__ = ["cluster", "profiling", "render"]
