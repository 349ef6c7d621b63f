"""Sources: streaming Parquet readers with column pruning (S1/D2).

Luzzu's streaming RDF reader parses a dump in one pass at constant memory
`[paper]` (/root/reference/README.md:7,12); the Ray-native equivalent is
``ray.data.read_parquet`` — file fragments stream in as Arrow blocks with
backpressure.  Column pruning (``columns=``) and predicate pushdown
(``filter=``) happen at the read so only needed bytes leave storage.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def transcript_paths(input_dir: str) -> list[str]:
    paths = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    return paths


def read_transcripts(
    paths: list[str] | str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    if isinstance(paths, str):
        paths = transcript_paths(paths)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def documents_as_transcripts(sf_dir: str) -> ray.data.Dataset:
    """Adapter: the driver's ``documents`` table as a single-turn corpus.

    doc_id -> conv_id, turn_idx=0, role="user", fixed ts (FIXTURES.md §2).
    """
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def adapt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "conv_id": pc.cast(t["doc_id"], pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "role": pa.array(["user"] * n, pa.string()),
                "text": t["text"],
                "tool": pa.nulls(n, pa.string()),
                "ts": pa.array([1_767_225_600_000_000] * n, pa.timestamp("us")),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


def read_transcripts_sql(
    query: str,
    create_connection=None,
    db_path: str | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """S2: remote/queryable-endpoint source (Luzzu's SPARQL-endpoint
    processor analogue — /root/reference/README.md:8 "queryable"
    capability).  Pages a SQL result set into the Dataset via
    ``ray.data.read_sql``; rows then flow through the identical
    normalize stage as the Parquet/JSONL sources, so any DBAPI endpoint
    (here DuckDB, the in-container stand-in for a warehouse) can feed
    the flagship pipeline unchanged.

    Pass either ``create_connection`` (zero-arg DBAPI connection
    factory — what a real remote endpoint supplies) or ``db_path`` for
    the local-DuckDB convenience case.  NOTE: the factory runs in Ray
    TASKS, so it must be serializable and must not capture an open
    connection.
    """
    if create_connection is None:
        if db_path is None:
            raise ValueError("need create_connection or db_path")

        def create_connection():  # noqa: ANN202 - DBAPI factory
            import duckdb

            return duckdb.connect(db_path, read_only=True)

    return ray.data.read_sql(query, create_connection, **kwargs)


def read_transcripts_jsonl(paths: list[str] | str, **kwargs) -> ray.data.Dataset:
    """JSONL transcript source (S1: Luzzu reads multiple serializations of
    the same logical stream — NT/Turtle/RDF-XML; our analogue is
    Parquet + JSONL).  Rows are normalized to the canonical schema by
    the pipeline's normalize stage, so a JSONL corpus flows through the
    identical stage chain."""
    import glob as _glob

    if isinstance(paths, str):
        found = sorted(_glob.glob(os.path.join(paths, "*.jsonl")))
        if not found:
            raise FileNotFoundError(f"no jsonl files under {paths}")
        paths = found
    return ray.data.read_json(paths, **kwargs)
