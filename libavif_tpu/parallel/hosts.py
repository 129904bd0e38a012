"""Multi-host (DCN) animation orchestration: GOP sharding across hosts.

Design (SURVEY §2.4 row 6, BASELINE config 6): an animation encode
scales across hosts by partitioning the frame sequence into contiguous
GOP chunks — one per host. Each host encodes its chunk independently on
its local chip mesh (codec/frame.encode_frames_pipelined, ICI-parallel
inside the host), and only the finished per-frame OBU payloads travel
back over DCN; host 0 assembles the sample table and container. Because
the coding loop is integer-deterministic, the host-sharded bitstream is
BIT-IDENTICAL to a single-host encode — which is how the dry run
verifies the orchestration without multi-host hardware.

The own-format codec is all-intra, so GOP boundaries carry no reference
dependency and no cross-host frame exchange is needed; for a future
inter-coded spec path, the same seam carries keyframe-aligned GOPs (each
GOP starts at a forced keyframe, the avifEncoderAddImage
FORCE_KEYFRAME convention, write.c:1702) so references never cross DCN.

Hosts are simulated as separate OS processes with their own JAX
runtimes (the DCN analogue: no shared device state, bytes-only IPC).
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from dataclasses import asdict

import numpy as np


def shard_gops(n_frames: int, n_hosts: int) -> list[range]:
    """Contiguous near-equal frame ranges, one per host (empty ranges
    dropped)."""
    n_hosts = max(1, min(n_hosts, n_frames))
    base = n_frames // n_hosts
    rem = n_frames % n_hosts
    out = []
    start = 0
    for h in range(n_hosts):
        k = base + (1 if h < rem else 0)
        out.append(range(start, start + k))
        start += k
    return [r for r in out if len(r)]


def _host_worker(payload):
    """One simulated host: fresh JAX runtime on virtual CPU devices,
    encodes its GOP chunk, returns the per-frame OBU payloads."""
    frames, params_dict, devices = payload
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={devices}"
        ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from ..codec.frame import FrameParams, encode_sequence_frames
    from ..constants import PixelFormat
    from ..image import Image

    imgs = []
    for planes, (w, h, depth, fmt) in frames:
        img = Image(w, h, depth, PixelFormat(fmt))
        img.allocate_planes("yuv")
        for c, p in enumerate(planes):
            if p is not None:
                img.yuv_planes[c][:] = p
        imgs.append(img)
    params = FrameParams(**params_dict)
    # each chunk is one GOP: leader KEY, rest inter-coded (falls back to
    # all-intra stills for the own-format/lossless paths)
    out = encode_sequence_frames(imgs, params)
    return [(obus, hdr) for obus, hdr in out]


def encode_animation_host_sharded(encoder, n_hosts: int = 2,
                                  devices_per_host: int = 2) -> bytes:
    """Encode an Encoder's queued animation frames with the GOP chunks
    sharded across `n_hosts` simulated hosts, then assemble the container
    on host 0. Sharding fixes the GOP schedule: every chunk leader is a
    forced keyframe (inter prediction never crosses hosts), and the output
    is bit-identical to encoder.finish() run locally with that same
    keyframe schedule."""
    frames = encoder._frames
    if not frames:
        raise ValueError("no frames queued")
    params = encoder._params(encoder.quality)
    pdict = asdict(params)
    gops = shard_gops(len(frames), n_hosts)
    for r in gops:
        frames[r[0]].keyframe = True  # sync-sample table matches the GOPs

    def pack(f):
        img = f.image
        planes = [None if p is None else np.asarray(p) for p in img.yuv_planes]
        return (planes, (img.width, img.height, img.depth, int(img.yuv_format)))

    jobs = [([pack(frames[i]) for i in r], pdict, devices_per_host) for r in gops]
    import multiprocessing as mp

    with ProcessPoolExecutor(
        max_workers=len(jobs), mp_context=mp.get_context("spawn")
    ) as pool:
        results = list(pool.map(_host_worker, jobs))
    for r, res in zip(gops, results):
        for i, (obus, hdr) in zip(r, res):
            frames[i].obus = obus
            if encoder._first_hdr is None:
                encoder._first_hdr = hdr
    return encoder.finish()
