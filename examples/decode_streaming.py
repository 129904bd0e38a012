"""Streaming/incremental decode example with a custom IO
(reference: examples/avif_example_decode_streaming.c)."""

import sys

from libavif_tpu.api import Decoder
from libavif_tpu.api.io import IO
from libavif_tpu.constants import AvifError, Result


class TrickleIO(IO):
    """Simulates a network source that delivers bytes in chunks."""

    def __init__(self, data: bytes, chunk: int = 512):
        self.data = data
        self.size_hint = len(data)
        self.persistent = True
        self.available = 0
        self.chunk = chunk

    def feed(self) -> bool:
        if self.available >= len(self.data):
            return False
        self.available = min(self.available + self.chunk, len(self.data))
        return True

    def read(self, offset: int, size: int) -> bytes:
        end = min(offset + size, self.available)
        return self.data[offset:end] if end > offset else b""


path = sys.argv[1] if len(sys.argv) > 1 else "example_out.avif"
with open(path, "rb") as f:
    payload = f.read()

io = TrickleIO(payload)
decoder = Decoder()
decoder.allow_incremental = True

while True:
    try:
        decoder.parse(io)
        break
    except AvifError as e:
        if e.result != Result.WAITING_ON_IO or not io.feed():
            raise

while True:
    try:
        if not decoder.next_image():
            break
        print(f"decoded frame {decoder.image_index} after {io.available} bytes")
    except AvifError as e:
        if e.result != Result.WAITING_ON_IO:
            raise
        print(f"  rows so far: {decoder.decoded_row_count()} ({io.available} bytes)")
        if not io.feed():
            raise
