"""Regenerate the golden box-structure dumps (tests/goldens/*.txt).

Run after a DELIBERATE change to the container writer, then review the
git diff of the goldens like any other code change.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from libavif_tpu.containers import boxdump  # noqa: E402
from test_box_golden import GOLDEN_DIR, SCENARIOS  # noqa: E402


def main() -> None:
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, fn in sorted(SCENARIOS.items()):
        path = GOLDEN_DIR / f"{name}.txt"
        path.write_text(boxdump.dump(fn()))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
