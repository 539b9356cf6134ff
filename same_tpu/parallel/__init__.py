from .shard import make_mesh, solve_window_batch, stack_problems

__all__ = ["make_mesh", "solve_window_batch", "stack_problems"]
