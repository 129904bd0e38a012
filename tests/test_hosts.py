"""Multi-host (DCN analogue) GOP-sharded animation encode.

SURVEY §2.4 row 6 / BASELINE config 6: animation scales across hosts by
GOP chunks; each simulated host is a separate OS process with its own
JAX runtime and virtual device mesh, and only encoded OBU payloads cross
the process boundary. The coding loop is integer-deterministic, so the
host-sharded container must be bit-identical to the local encode.
"""

import numpy as np

from libavif_tpu.api import Decoder, Encoder
from libavif_tpu.constants import PixelFormat
from libavif_tpu.image import Image
from libavif_tpu.parallel.hosts import encode_animation_host_sharded, shard_gops


def _frames(n=5, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = Image(64, 48, 8, PixelFormat.YUV420)
        img.allocate_planes("yuv")
        for p in img.yuv_planes:
            p[:] = rng.integers(0, 256, p.shape).astype(np.uint8)
        out.append(img)
    return out


def test_shard_gops_partition():
    assert [list(r) for r in shard_gops(5, 2)] == [[0, 1, 2], [3, 4]]
    assert [list(r) for r in shard_gops(2, 4)] == [[0], [1]]
    assert [list(r) for r in shard_gops(6, 3)] == [[0, 1], [2, 3], [4, 5]]


def test_host_sharded_animation_bit_identical():
    # sharding fixes the GOP schedule (chunk leaders become forced
    # keyframes so inter prediction never crosses hosts); the serial
    # baseline must encode the same schedule
    leaders = {r[0] for r in shard_gops(5, 2)}
    from libavif_tpu.constants import ADD_IMAGE_FLAG_FORCE_KEYFRAME

    e1 = Encoder()
    e1.quality = 70
    e1.timescale = 30
    for i, f in enumerate(_frames()):
        e1.add_image(
            f, duration=1,
            flags=ADD_IMAGE_FLAG_FORCE_KEYFRAME if i in leaders else 0,
        )
    single = e1.finish()

    e2 = Encoder()
    e2.quality = 70
    e2.timescale = 30
    for f in _frames():
        e2.add_image(f, duration=1)
    sharded = encode_animation_host_sharded(e2, n_hosts=2, devices_per_host=2)
    assert sharded == single

    d = Decoder()
    d.parse(sharded)
    d.next_image()
    assert (d.image.width, d.image.height) == (64, 48)
