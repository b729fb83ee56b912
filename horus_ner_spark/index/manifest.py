"""Checkpoint manifest — per-stage, per-partition lineage + metrics.

The principled version of the reference's incremental-reprocessing machinery:
``processed`` flags updated per row (reference:
src/core/util/definitions_sql.py:28-45, used
src/core/feature_extraction/features.py:371,440-442) and the sentence cache
probe-before-compute (reference: src/core/feature_extraction/util.py:728-763).

Keyed by a **content fingerprint** of the input (file names + sizes + build
config), never by wall-clock time, so resume decisions are deterministic
(SURVEY.md §7 hard-part (c)).  A stage is reusable iff its manifest entry
matches the current fingerprint AND its output files exist; otherwise it is
(re)built.  Per-partition metric rows (docs tokenized, postings emitted,
bytes compressed) are derived from the stage's committed output, so they are
always consistent with what is actually on disk.

Storage: one JSON file per stage under ``<index_dir>/_manifest/``, written
atomically (tmp + rename locally; single PUT on object stores) through the
catalog's pyarrow.fs layer — the manifest works unchanged against
``s3://.../ix`` index roots.  ``load_manifest_df`` exposes the whole
manifest as a DataFrame for inspection.
"""

from __future__ import annotations

import hashlib
import json
import os


def corpus_fingerprint(corpus_path: str, conf: dict | None = None) -> str:
    """Deterministic fingerprint of a parquet dataset + build config:
    sha256 over sorted (relative file name, size) pairs and the config.
    The listing goes through the catalog abstraction (catalog.py) so only
    that one primitive changes per storage/format."""
    from horus_ner_spark import catalog

    entries = [list(e) for e in catalog.list_data_files(corpus_path)]
    h = hashlib.sha256()
    h.update(json.dumps(entries, sort_keys=True).encode())
    h.update(json.dumps(conf or {}, sort_keys=True).encode())
    return h.hexdigest()


class Manifest:
    def __init__(self, index_dir: str) -> None:
        from horus_ner_spark import catalog

        self.dir = os.path.join(index_dir, "_manifest")
        catalog.fs_makedirs(self.dir)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def stage_complete(self, stage: str, fingerprint: str, output_path: str) -> bool:
        from horus_ner_spark import catalog

        p = self._path(stage)
        if not catalog.fs_exists(p):
            return False
        try:
            rec = catalog.fs_read_json(p)
        except (json.JSONDecodeError, OSError):
            return False
        if rec.get("status") != "complete" or rec.get("input_fingerprint") != fingerprint:
            return False
        # output must still exist and carry a parquet success marker
        return catalog.fs_exists(os.path.join(output_path, "_SUCCESS"))

    def commit_stage(
        self,
        stage: str,
        fingerprint: str,
        partitions: list[dict],
        totals: dict | None = None,
    ) -> None:
        """Atomically record a completed stage.

        ``partitions``: list of per-partition metric dicts, e.g.
        ``{"partition_id": 3, "postings_emitted": 123, "bytes_compressed": 456}``.
        """
        from horus_ner_spark import catalog

        rec = {
            "stage": stage,
            "status": "complete",
            "input_fingerprint": fingerprint,
            "partitions": partitions,
            "totals": totals or {},
        }
        catalog.fs_write_json_atomic(self._path(stage), rec)

    def read_stage(self, stage: str) -> dict | None:
        from horus_ner_spark import catalog

        p = self._path(stage)
        if not catalog.fs_exists(p):
            return None
        return catalog.fs_read_json(p)

    def rows(self) -> list[dict]:
        from horus_ner_spark import catalog

        out = []
        for rel, _sz in catalog.list_data_files(self.dir, suffix=".json"):
            rec = catalog.fs_read_json(os.path.join(self.dir, rel))
            for part in rec.get("partitions", [{}]):
                out.append(
                    {
                        "stage": rec["stage"],
                        "partition_id": int(part.get("partition_id", -1)),
                        "input_fingerprint": rec["input_fingerprint"],
                        "docs_tokenized": int(part.get("docs_tokenized", 0)),
                        "postings_emitted": int(part.get("postings_emitted", 0)),
                        "bytes_compressed": int(part.get("bytes_compressed", 0)),
                        "wall_s": float(rec.get("totals", {}).get("wall_s", 0.0)),
                        "status": rec["status"],
                    }
                )
        return out


def load_manifest_df(spark, index_dir: str):
    rows = Manifest(index_dir).rows()
    schema = (
        "stage string, partition_id int, input_fingerprint string, "
        "docs_tokenized long, postings_emitted long, bytes_compressed long, "
        "wall_s double, status string"
    )
    return spark.createDataFrame(rows, schema=schema)
