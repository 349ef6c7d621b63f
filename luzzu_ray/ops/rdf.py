"""N-Triples RDF support — the reference's NATIVE data model.

Luzzu assesses Linked-Data datasets streamed as N-Triples
(/root/reference/README.md:7 — "quality assessment of linked open
datasets"); this module re-expresses that input path Ray-Data-first: a
vectorized line parser (`parse_ntriples_batch`, one compiled-regex
`pc.extract_regex` pass per batch — no per-line Python), a serializer
(`triples_to_lines_batch`), text-file read/write wrappers, and the
subject-level quality statistics Luzzu's completeness/conciseness
metric family computes over the triple stream.

Grammar subset: `<subj> <pred> (<obj>|"literal")  .` — IRIs and plain
double-quoted literals (no datatype/lang tags, no blank nodes, no
escapes inside literals).  Lines that do not match are counted as
MALFORMED (Luzzu's problem-report semantics: skip + report, never
crash); the count is exposed so a pipeline can gate on it.

Scale shape: parsing and serialization are embarrassingly parallel
maps; `rdf_subject_stats` pre-aggregates per block before ONE narrow
subject-keyed grouped sum (counts and literal tallies are commutative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# one capture per component; anchored; permissive inner classes keep
# the regex RE2-compatible (the SQL twin uses the NUMBERED variant of
# the same pattern verbatim)
NT_PATTERN = (
    r"^<([^<>\s]+)>\s+<([^<>\s]+)>\s+"
    r'(?:<([^<>\s]+)>|"([^"]*)")\s*\.\s*$'
)
# two unambiguous passes (Arrow's extract_regex yields EMPTY STRINGS,
# not nulls, for non-participating alternation groups)
_NT_IRI = (
    r"^<(?P<s>[^<>\s]+)>\s+<(?P<p>[^<>\s]+)>\s+"
    r"<(?P<o>[^<>\s]+)>\s*\.\s*$"
)
_NT_LIT = (
    r"^<(?P<s>[^<>\s]+)>\s+<(?P<p>[^<>\s]+)>\s+"
    r'"(?P<o>[^"]*)"\s*\.\s*$'
)


def triples_to_lines_batch(t: pa.Table) -> pa.Table:
    """(subj, pred, obj, is_literal) -> one N-Triples line per row."""
    obj = pc.if_else(
        t["is_literal"],
        pc.binary_join_element_wise('"', t["obj"], '"', ""),
        pc.binary_join_element_wise("<", t["obj"], ">", ""),
    )
    line = pc.binary_join_element_wise(
        "<", t["subj"], "> <", t["pred"], "> ", obj, " .", "")
    return pa.table({"line": line})


def parse_ntriples_batch(t: pa.Table, line_col: str = "line") -> pa.Table:
    """Vectorized N-Triples parse: ONE ``pc.extract_regex`` pass; rows
    that fail the grammar emit ``malformed=True`` with NULL components
    (problem-report semantics)."""
    lines = pc.fill_null(t[line_col], "")
    e_iri = pc.extract_regex(lines, _NT_IRI)
    e_lit = pc.extract_regex(lines, _NT_LIT)
    ok_iri = pc.is_valid(e_iri)
    ok_lit = pc.is_valid(e_lit)
    ok = pc.or_(ok_iri, ok_lit)
    is_lit = pc.and_(ok, ok_lit)

    def pick(field):
        return pc.if_else(ok_lit, pc.struct_field(e_lit, field),
                          pc.struct_field(e_iri, field))

    s, p, obj = pick("s"), pick("p"), pick("o")
    return pa.table({
        "subj": s, "pred": p, "obj": obj,
        "is_literal": pc.if_else(ok, is_lit, pa.scalar(None, pa.bool_())),
        "malformed": pc.invert(ok),
    })


def write_ntriples(ds: ray.data.Dataset, path: str) -> None:
    """Serialize a triple Dataset to N-Triples text files (one file per
    block, the resumable-output layout)."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table, ctx=None) -> pa.Table:
        lines = triples_to_lines_batch(t)["line"].to_pylist()
        import uuid

        fn = os.path.join(path, f"part-{uuid.uuid4().hex}.nt")
        with open(fn, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    # small driver-side count sum; the writes happen in the tasks
    for _ in ds.map_batches(
            write_block, batch_format="pyarrow").iter_batches():
        pass


def read_ntriples(paths: list[str] | str) -> ray.data.Dataset:
    """N-Triples source: text lines -> parsed triple Dataset (malformed
    lines kept with the flag; filter on it to drop)."""
    return ray.data.read_text(paths).map_batches(
        lambda t: parse_ntriples_batch(t, line_col="text"),
        batch_format="pyarrow",
    )


def rdf_subject_stats(
    triples: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-SUBJECT completeness/conciseness statistics (the Luzzu
    metric-family shape over the triple stream): triple count, distinct
    predicate count, literal-object count.  Malformed rows are excluded
    here (they surface via ``parse_ntriples_batch``'s flag).

    One subject-keyed exchange; block partials collapse (subj, pred)
    duplicates BEFORE the shuffle so the exchange carries bounded rows.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(triples, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_lit": pa.array([], pa.int64()),
            })
        ok = t.filter(pc.invert(pc.fill_null(t["malformed"], True))) \
            if "malformed" in t.schema.names else t
        g = pa.table({
            "subj": ok["subj"], "pred": ok["pred"],
            "n": pa.array(np.ones(ok.num_rows, dtype=np.int64)),
            "n_lit": pc.cast(ok["is_literal"], pa.int64()),
        }).group_by(["subj", "pred"]).aggregate(
            [("n", "sum"), ("n_lit", "sum")])
        return g.rename_columns(["subj", "pred", "n", "n_lit"])

    part = triples.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["subj"])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "subj": pa.array([], pa.string()),
                "n_triples": pa.array([], pa.int64()),
                "n_preds": pa.array([], pa.int64()),
                "n_literals": pa.array([], pa.int64()),
            })
        # same subject fully co-located: collapse (subj, pred) partials,
        # then count distinct preds + sum tallies per subject
        g = t.group_by(["subj", "pred"]).aggregate(
            [("n", "sum"), ("n_lit", "sum")])
        g2 = pa.table({
            "subj": g["subj"],
            "n": g["n_sum"],
            "n_lit": g["n_lit_sum"],
            "one": pa.array(np.ones(g.num_rows, dtype=np.int64)),
        }).group_by(["subj"]).aggregate(
            [("n", "sum"), ("n_lit", "sum"), ("one", "sum")])
        return pa.table({
            "subj": g2["subj"],
            "n_triples": g2["n_sum"],
            "n_preds": g2["one_sum"],
            "n_literals": g2["n_lit_sum"],
        })

    return part.map_batches(final, batch_format="pyarrow", batch_size=None)


def rdf_conciseness(
    triples: ray.data.Dataset,
    num_partitions: int | None = None,
) -> pa.Table:
    """Corpus-level CONCISENESS metric (Luzzu's duplicate-statement
    family): total triples vs distinct triples vs duplicates, in one
    row.  Triple identity hashes through the exact-dedup key scheme
    (two independent 64-bit polynomial hashes of the canonical
    N-Triples line — `ops/lines._line_keys`; collision bound n^2/2^128,
    a collision surfaces as an oracle hash mismatch) so the exchange
    carries 16-byte keys, never the strings.

    Shape: per-block distinct-key partials -> one keyed exchange ->
    block-final distinct counts -> two driver integers.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.lines import _line_keys
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    # malformed parse rows are NOT triples (skip-and-report contract,
    # like rdf_subject_stats); materialize so the upstream lineage runs
    # ONCE for both the count and the key pass (review r05 finding)
    triples = triples.map_batches(
        lambda t: (t.filter(pc.invert(pc.fill_null(t["malformed"], True)))
                   if "malformed" in t.schema.names else t),
        batch_format="pyarrow",
    ).materialize()
    width = auto_partitions(triples, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "k1": pa.array([], pa.uint64()),
                "k2": pa.array([], pa.uint64()),
            })
        lines = triples_to_lines_batch(t)["line"].combine_chunks()
        k1, k2 = _line_keys(lines)
        order = np.lexsort((k2, k1))
        k1s, k2s = k1[order], k2[order]
        first = np.ones(len(k1s), dtype=bool)
        first[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
        return pa.table({
            "k1": pa.array(k1s[first]),
            "k2": pa.array(k2s[first]),
        })

    # total row count is a separate streaming count (cheap metadata)
    n_total = triples.count()
    parts = triples.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["k1"])

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64())})
        k1 = t["k1"].to_numpy(zero_copy_only=False)
        k2 = t["k2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k2, k1))
        k1s, k2s = k1[order], k2[order]
        first = np.ones(len(k1s), dtype=bool)
        first[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
        return pa.table({"d": pa.array(
            [int(first.sum())], pa.int64())})

    n_distinct = sum(
        r["d"] for r in parts.map_batches(
            distinct_block, batch_format="pyarrow", batch_size=None
        ).take_all())
    return pa.table({
        "n_triples": pa.array([n_total], pa.int64()),
        "n_distinct": pa.array([int(n_distinct)], pa.int64()),
        "n_dup": pa.array([n_total - int(n_distinct)], pa.int64()),
    })


def rdf_dangling_links(
    triples: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-predicate INTERLINKING health (Luzzu's
    dereferenceability/interlinking family, resolved against the
    dataset itself instead of the network): over IRI-object triples,
    how many links point at an IRI that is NOT a subject of the
    dataset (dangling).  Output (pred, n_links, n_dangling).

    Shape: the subject set stays a narrow string dataset; one
    distributed ANTI join (obj vs subj — the existence-join exchange)
    marks dangling rows, then two commutative per-pred count reduces.
    """
    from luzzu_ray.ops.relational import anti_join, grouped_sum_q

    links = triples.map_batches(
        lambda t: t.filter(
            pc.and_(pc.invert(pc.fill_null(t["malformed"], True))
                    if "malformed" in t.schema.names
                    else pa.array([True] * t.num_rows),
                    pc.invert(pc.fill_null(t["is_literal"], True)))
        ).select(["pred", "obj"]),
        batch_format="pyarrow",
    ).materialize()
    subjects = triples.map_batches(
        lambda t: pa.table({"subj": t["subj"].combine_chunks().unique()})
        if t.num_rows else pa.table({"subj": pa.array([], pa.string())}),
        batch_format="pyarrow",
    )
    dangling = anti_join(
        links, subjects, "obj", "subj", ["pred"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({
            "pred": t["pred"],
            "n_dangling": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "n_links": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow",
    )
    totals = links.map_batches(
        lambda t: pa.table({
            "pred": t["pred"],
            "n_dangling": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "n_links": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow",
    )
    return grouped_sum_q(
        totals.union(dangling), ["pred"], float_cols={},
        int_cols={"n_links": "n_links", "n_dangling": "n_dangling"},
        num_partitions=num_partitions,
    )
