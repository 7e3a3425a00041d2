from .continuous import ContinuousEngine
from .engine import ServingEngine

__all__ = ["ServingEngine", "ContinuousEngine"]
