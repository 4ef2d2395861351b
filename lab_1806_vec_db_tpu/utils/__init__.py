from . import io, config, candidates, serde

__all__ = ["io", "config", "candidates", "serde"]
