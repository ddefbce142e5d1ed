from siss_tpu.tasks.base import Task

__all__ = ["Task"]
