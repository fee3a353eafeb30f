from spfx.stream.engine import StreamingCholesky, StreamingLU

__all__ = ["StreamingCholesky", "StreamingLU"]
