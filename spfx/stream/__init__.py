from spfx.stream.engine import StreamingCholesky

__all__ = ["StreamingCholesky"]
