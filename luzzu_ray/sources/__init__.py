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


# Deterministic multi-turn derivation parameters (shared by the engine
# adapter below and the SQL twin in __ray_entry__._multiturn_sql).
MULTITURN_TS0 = 1_767_225_600_000_000
MULTITURN_SLICE_W = 48
MULTITURN_SLICE_STEP = 24
MULTITURN_ROLES = ("user", "assistant", "system", "tool")


def documents_as_multiturn(sf_dir: str) -> ray.data.Dataset:
    """Adapter: the driver's ``documents`` table as a deterministic
    MULTI-TURN conversation corpus (2-4 turns per doc) for the
    conversation-structure operators.

    Derivation is a pure function of ``doc_id`` so a SQL twin can
    rebuild the corpus exactly (``unnest(generate_series(...))``):

    - ``n_turns = 2 + doc_id % 3``
    - roles alternate user/assistant; ``doc_id % 5 == 0`` conversations
      open with a ``system`` turn instead (then user, assistant, ...)
    - ``doc_id % 7 == 0`` (with >= 3 turns) repeats turn 1's role at
      turn 2 — an injected ALTERNATION VIOLATION
    - ``doc_id % 11 == 0`` (with >= 3 turns) makes turn 2 a ``tool``
      turn (tool='search'); this rule wins over the repeat rule.
      After a ``system`` opener turn 1 is ``user``, so those tool turns
      are MISPLACED (no preceding assistant) — a natural good/bad mix.
    - ``text`` = 48-char slice of the doc text at offset 24*turn_idx
      (ASCII fixture domain: DuckDB ``substr`` chars == codeunits)
    - ``ts = TS0 + doc_id*1s + turn_idx*60s`` (microseconds)
    """
    import numpy as np
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    W, STEP = MULTITURN_SLICE_W, MULTITURN_SLICE_STEP

    def adapt(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(did) == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "role": pa.array([], pa.string()),
                    "text": pa.array([], pa.string()),
                    "tool": pa.array([], pa.string()),
                    "ts": pa.array([], pa.timestamp("us")),
                }
            )
        nt = 2 + (did % 3)
        total = int(nt.sum())
        row = np.repeat(np.arange(len(did), dtype=np.int64), nt)
        starts = np.concatenate(([0], np.cumsum(nt)[:-1]))
        ti = np.arange(total, dtype=np.int64) - np.repeat(starts, nt)
        d = did[row]
        sysfirst = d % 5 == 0
        # base alternation (role codes: 0=user 1=assistant 2=system 3=tool)
        code = np.where(ti % 2 == 0, 0, 1)
        code = np.where(
            sysfirst, np.where(ti == 0, 2, np.where(ti % 2 == 1, 0, 1)), code
        )
        has3 = nt[row] >= 3
        rep = (d % 7 == 0) & has3 & (ti == 2)
        code = np.where(rep, np.where(sysfirst, 0, 1), code)
        toolturn = (d % 11 == 0) & has3 & (ti == 2)
        code = np.where(toolturn, 3, code)
        role = pc.take(
            pa.array(list(MULTITURN_ROLES)), pa.array(code.astype(np.int64))
        )
        text_taken = pc.take(t["text"].combine_chunks(), pa.array(row))
        # <= 4 distinct turn offsets -> one scalar-slice kernel each
        text = pc.utf8_slice_codeunits(text_taken, start=0, stop=W)
        for i in range(1, int(nt.max())):
            text = pc.if_else(
                pa.array(ti == i),
                pc.utf8_slice_codeunits(
                    text_taken, start=i * STEP, stop=i * STEP + W
                ),
                text,
            )
        tool = pc.if_else(
            pa.array(code == 3),
            pa.scalar("search", pa.string()),
            pa.nulls(total, pa.string()),
        )
        ts = MULTITURN_TS0 + d * 1_000_000 + ti * 60_000_000
        return pa.table(
            {
                "conv_id": pc.cast(pa.array(d), pa.string()),
                "turn_idx": pa.array(ti.astype(np.int32)),
                "role": role,
                "text": text,
                "tool": tool,
                "ts": pa.array(ts).cast(pa.timestamp("us")),
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
