"""Build the --py-files artifact for spark-submit (BASELINE.json:6 ship shape).

    python jobs/package.py            # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/run_pipeline.py ...

The zip contains only the ``simhash_spark`` package (no tests/bench); it is
importable from executors' PYTHONPATH as shipped by spark-submit.
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or REPO / "dist" / "engine.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "simhash_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
