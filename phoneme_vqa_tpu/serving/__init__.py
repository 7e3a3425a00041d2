from .engine import ServingEngine

__all__ = ["ServingEngine"]
