from .propagate import propagate, propagate_segment

__all__ = ["propagate", "propagate_segment"]
