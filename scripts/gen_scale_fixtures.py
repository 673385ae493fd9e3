"""Deterministic sf1 fixtures for the scaling-curvature spot-bench
(VERDICT r4 item 5): 10x the sf0.1 documents/embeddings tables, built so
the WORKLOAD character scales linearly instead of degenerating.

- documents: 10 replicas with offset doc_ids; replicas k>0 suffix every
  word with "_k", which keeps each replica's internal dup/near-dup
  structure identical to sf0.1 while guaranteeing ZERO cross-replica
  shingle collisions — naive copies would make every doc a 10-way
  duplicate and quadratically explode the dedup pair tables, which is a
  different (and unrealistic) workload, not a scale-up. Replicas k>0
  also rewrite source -> "{source}x{k}", so source/domain cardinality
  scales 10x WITH the data (20 -> 200 distinct sources): a real web
  crawl grows by adding sites, not by making each site 10x bigger, and
  a fixed-cardinality source column would cap the parallelism of every
  per-domain window/agg at 10-20 groups no matter the data size —
  measuring the fixture, not the operator (VERDICT r7 task 3).
- embeddings: replica 0 is the original; replicas k>0 draw fresh vectors
  from the same isotropic distribution (seeded per replica) with the
  original label multiset, so ANN bucket occupancy grows linearly.
- events: 10 replicas with offset event_ids and user_ids, timestamps
  UNCHANGED — the stream gets 10x denser (10x rows and 10x distinct
  users per window) while the window count stays fixed, which is exactly
  the claim the two-level exchange makes: the cross-job hand-off stays
  (windows x shards)-sized no matter how much data flows through.

Layout: each table is a DIRECTORY named ``<table>.parquet/`` holding
``N_PARTS`` part files (VERDICT r8 task 4). A single ~10 MB parquet file
plans as 1-2 input splits on a 32-core session, so every sf1 spot whose
cost lives in the scan/explode stage measured input-split starvation
instead of the plan (corpus_boilerplate's 4.88 ratio was mostly this).
A real 10x corpus arrives in thousands of splits; 16 parts restores that
layout. Rows are round-robined across parts BY REPLICA slice so each part
carries a cross-replica mix (splitting the concatenation into 16
contiguous runs would give some parts single-replica skew for grouped
work). Spark reads the directory natively; the old single-file layout is
detected as stale and rebuilt.

Pure pyarrow/numpy — no Spark needed; regenerating is idempotent and
seconds-fast, so the parquet outputs stay out of git.
"""

from __future__ import annotations

import os

REPLICAS = 10
DOC_OFFSET = 1_000_000
VEC_OFFSET = 100_000
EVENT_OFFSET = 10_000_000
USER_OFFSET = 1_000_000
N_PARTS = 16


def _is_current(path: str) -> bool:
    """True when ``path`` is the multi-file directory layout with all parts."""
    if not os.path.isdir(path):
        return False
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return len(parts) == N_PARTS


def _write_parts(table, path: str) -> None:
    """Write ``table`` as a directory of N_PARTS round-robin part files."""
    import shutil

    import pyarrow.parquet as pq

    if os.path.isfile(path):  # stale single-file layout
        os.remove(path)
    elif os.path.isdir(path):
        shutil.rmtree(path)
    tmp = path + ".__building"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    # round-robin by row so every part holds a cross-replica mix: take(i::N)
    n = table.num_rows
    for p in range(N_PARTS):
        idx = list(range(p, n, N_PARTS))
        pq.write_table(table.take(idx), os.path.join(tmp, f"part-{p:05d}.parquet"))
    os.rename(tmp, path)


def ensure_sf1(
    src_dir: str = "/root/testdata/sf0.1",
    out_dir: str | None = None,
) -> str:
    """Create (once) and return the sf1 fixture directory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = out_dir or os.path.join(repo, "fixtures", "sf1")
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    ev_path = os.path.join(out_dir, "events.parquet")
    if all(_is_current(p) for p in (docs_path, emb_path, ev_path)):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    if not _is_current(ev_path):
        ev = pq.read_table(os.path.join(src_dir, "events.parquet"))
        cols = {name: ev.column(name) for name in ev.schema.names}
        import pyarrow.compute as pc

        parts = []
        for k in range(REPLICAS):
            parts.append(
                pa.table(
                    {
                        "event_id": pc.add(cols["event_id"], k * EVENT_OFFSET),
                        "ts": cols["ts"],
                        "user_id": pc.add(cols["user_id"], k * USER_OFFSET),
                        "event_type": cols["event_type"],
                        "value": cols["value"],
                        "props": cols["props"],
                    }
                )
            )
        _write_parts(pa.concat_tables(parts), ev_path)

    if _is_current(docs_path) and _is_current(emb_path):
        return out_dir

    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    d = docs.to_pydict()
    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for k in range(REPLICAS):
        for i in range(len(d["doc_id"])):
            text = d["text"][i]
            if k > 0 and text is not None:
                text = " ".join(w + f"_{k}" for w in text.split(" "))
            src = d["source"][i]
            if k > 0 and src is not None:
                src = f"{src}x{k}"
            out["doc_id"].append(d["doc_id"][i] + k * DOC_OFFSET)
            out["text"].append(text)
            out["lang"].append(d["lang"][i])
            out["source"].append(src)
            out["n_chars"].append(len(text) if text is not None else None)
    _write_parts(
        pa.table(out, schema=pa.schema([
            ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
            ("source", pa.string()), ("n_chars", pa.int64()),
        ])),
        docs_path,
    )

    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    e = emb.to_pydict()
    n, dim = len(e["vec_id"]), len(e["embedding"][0])
    ids, vecs, labels = [], [], []
    for k in range(REPLICAS):
        ids.extend(v + k * VEC_OFFSET for v in e["vec_id"])
        labels.extend(e["label"])
        if k == 0:
            vecs.extend(e["embedding"])
        else:
            rng = np.random.default_rng(1000 + k)
            fresh = rng.uniform(-0.5, 0.5, (n, dim)).astype(np.float32)
            vecs.extend(fresh.tolist())
    _write_parts(
        pa.table(
            {"vec_id": ids, "embedding": vecs, "label": labels},
            schema=pa.schema([
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]),
        ),
        emb_path,
    )
    return out_dir


# key offsets for the relational replicas — all comfortably above the
# sf0.1 key ranges (orderkey max 150k, custkey 15k, partkey 20k,
# suppkey 1k), asserted at build time
ORDER_OFFSET = 10_000_000
CUST_OFFSET = 1_000_000
PART_OFFSET = 1_000_000
SUPP_OFFSET = 1_000_000


def ensure_sf1_relational(
    src_dir: str = "/root/testdata/sf0.1",
    out_dir: str | None = None,
) -> str:
    """Extend the sf1 fixture directory with 10x relational tables
    (VERDICT r9 task 2: the FULL bench sweep at sf1 needs every table the
    79 bench queries touch, not just documents/embeddings/events).

    Replication scheme: each replica k offsets its keys consistently
    (o_custkey moves with c_custkey, l_orderkey with o_orderkey, …), so
    referential structure, join selectivity, and per-group distributions
    are preserved — each replica joins within itself, per-group row
    counts grow 10x, and group cardinality (brands, statuses, dates)
    stays fixed, which is how a real fact-table decade grows. region and
    nation are copied unchanged: dimensions don't scale with facts, and
    the n_nationkey references stay valid in every replica.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = out_dir or os.path.join(repo, "fixtures", "sf1")
    os.makedirs(out_dir, exist_ok=True)

    # tiny dimensions: straight copies (single file is fine — 5/25 rows)
    for t in ("region", "nation"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            pq.write_table(pq.read_table(os.path.join(src_dir, f"{t}.parquet")), dst)

    plans = {
        "customer": {"c_custkey": CUST_OFFSET},
        "supplier": {"s_suppkey": SUPP_OFFSET},
        "part": {"p_partkey": PART_OFFSET},
        "orders": {"o_orderkey": ORDER_OFFSET, "o_custkey": CUST_OFFSET},
        "lineitem": {
            "l_orderkey": ORDER_OFFSET,
            "l_partkey": PART_OFFSET,
            "l_suppkey": SUPP_OFFSET,
        },
    }
    for t, offsets in plans.items():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if _is_current(dst):
            continue
        src = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        for col, off in offsets.items():
            mx = pc.max(src.column(col)).as_py()
            assert mx < off, f"{t}.{col} max {mx} >= offset {off}"
        parts = []
        for k in range(REPLICAS):
            cols = {}
            for name in src.schema.names:
                c = src.column(name)
                if name in offsets and k > 0:
                    c = pc.add(c, k * offsets[name])
                cols[name] = c
            parts.append(pa.table(cols, schema=src.schema))
        _write_parts(pa.concat_tables(parts), dst)
    return out_dir


# second-decade offsets: applied ON TOP of the sf1 fixture (whose ids
# already carry the first-decade offsets), asserted at build time
DOC_OFFSET10 = 100_000_000
VEC_OFFSET10 = 10_000_000
EVENT_OFFSET10 = 1_000_000_000
USER_OFFSET10 = 100_000_000
ORDER_OFFSET10 = 1_000_000_000
CUST_OFFSET10 = 100_000_000
SF10_PARTS = 64


def ensure_sf10_spots(
    sf1_dir: str | None = None,
    out_dir: str | None = None,
) -> str:
    """Create (once) the sf10 SPOT fixture directory: documents, events,
    orders and embeddings at 100x sf0.1 (10x the sf1 fixture), the only
    tables the sf10 spot queries touch (text_winnow_robust /
    retention_cohorts / rfm_segments_sketch — VERDICT r10 task 4 — plus,
    round 12 per VERDICT r11 task 5, the 3 steepest sf1 ratios:
    knn_label_propagation_bucketed / dedup_minhash_lsh / dedup_clusters).

    Same replication philosophy as ensure_sf1, applied on top of sf1:
    - documents: replica j>0 suffixes every word with ``_s{j}`` (distinct
      from sf1's ``_{k}`` namespace, so cross-replica shingle collisions
      stay ZERO and the dup/near-dup structure per replica matches
      sf0.1's) and rewrites source -> "{source}y{j}" (2,000 distinct
      sources — cardinality keeps scaling WITH the data).
    - events: ids/users offset per replica, timestamps UNCHANGED — the
      stream gets 100x denser over the same 720 windows, the exact
      two-level claim at another decade.
    - orders: keys offset consistently so each replica joins within
      itself; group cardinality (status, dates) stays fixed.
    - embeddings: replica 0 is the sf1 table; replicas j>0 draw fresh
      vectors from the same isotropic distribution (seeded per replica,
      a namespace disjoint from sf1's seeds) with the original label
      multiset, so LSH bucket occupancy keeps growing linearly and the
      occupancy rule's parameter step at 100x is exercised for real.
    64 part files per table (10x the rows of sf1's 16-part layout keeps
    bytes-per-split comparable, so spots measure plans, not splits).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = sf1_dir or ensure_sf1()
    ensure_sf1_relational(out_dir=sf1_dir)
    out_dir = out_dir or os.path.join(repo, "fixtures", "sf10")
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in
             ("documents", "events", "orders", "embeddings")}

    def _is_current10(path: str) -> bool:
        if not os.path.isdir(path):
            return False
        return sum(f.endswith(".parquet") for f in os.listdir(path)) == SF10_PARTS

    if all(_is_current10(p) for p in paths.values()):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def _write10(table, path):
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path)
        tmp = path + ".__building"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        n = table.num_rows
        for p in range(SF10_PARTS):
            pq.write_table(
                table.take(list(range(p, n, SF10_PARTS))),
                os.path.join(tmp, f"part-{p:05d}.parquet"),
            )
        os.rename(tmp, path)

    if not _is_current10(paths["documents"]):
        docs = pq.read_table(os.path.join(sf1_dir, "documents.parquet"))
        d = docs.to_pydict()
        assert max(d["doc_id"]) < DOC_OFFSET10
        out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
        for j in range(REPLICAS):
            for i in range(len(d["doc_id"])):
                text = d["text"][i]
                if j > 0 and text is not None:
                    text = " ".join(w + f"_s{j}" for w in text.split(" "))
                src = d["source"][i]
                if j > 0 and src is not None:
                    src = f"{src}y{j}"
                out["doc_id"].append(d["doc_id"][i] + j * DOC_OFFSET10)
                out["text"].append(text)
                out["lang"].append(d["lang"][i])
                out["source"].append(src)
                out["n_chars"].append(len(text) if text is not None else None)
        _write10(
            pa.table(out, schema=pa.schema([
                ("doc_id", pa.int64()), ("text", pa.string()),
                ("lang", pa.string()), ("source", pa.string()),
                ("n_chars", pa.int64()),
            ])),
            paths["documents"],
        )

    if not _is_current10(paths["events"]):
        ev = pq.read_table(os.path.join(sf1_dir, "events.parquet"))
        assert pc.max(ev.column("event_id")).as_py() < EVENT_OFFSET10
        assert pc.max(ev.column("user_id")).as_py() < USER_OFFSET10
        parts = []
        for j in range(REPLICAS):
            cols = {name: ev.column(name) for name in ev.schema.names}
            if j > 0:
                cols["event_id"] = pc.add(cols["event_id"], j * EVENT_OFFSET10)
                cols["user_id"] = pc.add(cols["user_id"], j * USER_OFFSET10)
            parts.append(pa.table(cols, schema=ev.schema))
        _write10(pa.concat_tables(parts), paths["events"])

    if not _is_current10(paths["embeddings"]):
        emb = pq.read_table(os.path.join(sf1_dir, "embeddings.parquet"))
        e = emb.to_pydict()
        assert max(e["vec_id"]) < VEC_OFFSET10
        n, dim = len(e["vec_id"]), len(e["embedding"][0])
        ids, vecs, labels = [], [], []
        for j in range(REPLICAS):
            ids.extend(v + j * VEC_OFFSET10 for v in e["vec_id"])
            labels.extend(e["label"])
            if j == 0:
                vecs.extend(e["embedding"])
            else:
                # seed namespace disjoint from ensure_sf1's 1000+k
                rng = np.random.default_rng(20_000 + j)
                fresh = rng.uniform(-0.5, 0.5, (n, dim)).astype(np.float32)
                vecs.extend(fresh.tolist())
        _write10(
            pa.table(
                {"vec_id": ids, "embedding": vecs, "label": labels},
                schema=pa.schema([
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]),
            ),
            paths["embeddings"],
        )

    if not _is_current10(paths["orders"]):
        od = pq.read_table(os.path.join(sf1_dir, "orders.parquet"))
        assert pc.max(od.column("o_orderkey")).as_py() < ORDER_OFFSET10
        assert pc.max(od.column("o_custkey")).as_py() < CUST_OFFSET10
        parts = []
        for j in range(REPLICAS):
            cols = {name: od.column(name) for name in od.schema.names}
            if j > 0:
                cols["o_orderkey"] = pc.add(cols["o_orderkey"], j * ORDER_OFFSET10)
                cols["o_custkey"] = pc.add(cols["o_custkey"], j * CUST_OFFSET10)
            parts.append(pa.table(cols, schema=od.schema))
        _write10(pa.concat_tables(parts), paths["orders"])
    return out_dir


if __name__ == "__main__":
    d = ensure_sf1()
    print(ensure_sf1_relational(out_dir=d))
