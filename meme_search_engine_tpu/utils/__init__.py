from .fp16 import decode_fp16_buffer, encode_fp16_buffer
from .timer import Timer

__all__ = ["decode_fp16_buffer", "encode_fp16_buffer", "Timer"]
