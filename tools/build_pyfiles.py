"""Build the --py-files zip for spark-submit deployment."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "redpajama_v2_processing_spark"


def build(out: Path = ROOT / "dist" / "rpv2spark.zip") -> Path:
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(PKG.rglob("*.py")):
            z.write(f, f.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
