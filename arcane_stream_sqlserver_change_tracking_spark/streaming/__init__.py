from .runner import CdcEngine, EngineOptions, WatermarkNotSetError, BatchResult

__all__ = ["CdcEngine", "EngineOptions", "WatermarkNotSetError", "BatchResult"]
