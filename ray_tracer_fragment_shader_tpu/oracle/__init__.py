from .numpy_ref import OracleScene, oracle_render, trace_ray

__all__ = ["OracleScene", "oracle_render", "trace_ray"]
