#!/usr/bin/env python3
"""Generate the golden logistic-regression model/prediction tables for the
fixed fixture corpus (nation ⋈ region names — identical at every scale
factor), using an INDEPENDENT reference implementation of the documented
contract (the tools/gen_bpe_golden.py / gen_unigram_golden.py pattern).

Usage: python3 tools/gen_lr_golden.py [sfDir]

Contract mirrored (not the Scala code):
  - tokens   = text.strip().lower().split(); features = hashed n-grams:
               bucket = int(md5(' '.join(gram)).hexdigest()[:8], 16) % B
  - per-doc sparse counts, bucket-sorted; margin folds left-to-right
  - full-batch GD: r_d = sigmoid(margin_d) - y_d; per-(doc,bucket)
    contributions r·x quantized to 18 decimal places (HALF_UP) and summed
    EXACTLY (the engine's DECIMAL(38,18) shuffle-exact aggregation);
    w_b -= step·(G_b/N + l2·w_b), intercept unregularized
  - labels: y = doc_id % 2 (the fixture's deterministic split)
  - weights published as integer micro-units k = floor(w·1e6 + 0.5), so
    the oracle's k/1000000.0 is the same IEEE double as the engine's
    roundHalfUp(w, 6); predictions decided on the exact margin sign
"""
import hashlib
import math
import sys
from decimal import Decimal, ROUND_HALF_UP, getcontext

import duckdb

getcontext().prec = 60
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
QUANTUM = Decimal("1e-18")

N_GRAM = 2
BUCKETS = 64
ITERS = 40
STEP = 0.5
L2 = 1e-3


def corpus(con):
    rows = con.execute(
        f"""SELECT n_nationkey, n_name || ' ' || r_name
            FROM '{sfdir}/nation.parquet' n
            JOIN '{sfdir}/region.parquet' r ON n_regionkey = r_regionkey
            ORDER BY n_nationkey"""
    ).fetchall()
    return [(r[0], r[1]) for r in rows]


def bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % BUCKETS


def doc_features(text):
    toks = [w for w in text.strip().lower().split() if w]
    counts = {}
    for i in range(len(toks) - N_GRAM + 1):
        b = bucket(" ".join(toks[i:i + N_GRAM]))
        counts[b] = counts.get(b, 0) + 1
    return sorted((b, float(c)) for b, c in counts.items())


def fit(docs):
    feats = [(doc_id % 2, doc_features(text)) for doc_id, text in docs]
    n_docs = float(len(feats))
    w = [0.0] * BUCKETS
    b0 = 0.0
    for _ in range(ITERS):
        grads = {}
        for y, f in feats:
            m = b0
            for b, x in f:
                m = m + w[b] * x
            r = 1.0 / (1.0 + math.exp(-m)) - y
            contribs = [(-1, r)] + [(b, r * x) for b, x in f]
            for b, g in contribs:
                # mirror the engine: Spark casts double->DECIMAL(38,18) via the
                # SHORTEST decimal form (Double.toString), not the exact binary
                q = Decimal(repr(g)).quantize(QUANTUM, rounding=ROUND_HALF_UP)
                grads[b] = grads.get(b, Decimal(0)) + q
        w = [w[b] - STEP * (float(grads.get(b, Decimal(0))) / n_docs + L2 * w[b])
             for b in range(BUCKETS)]
        b0 -= STEP * (float(grads.get(-1, Decimal(0))) / n_docs)
    return w, b0


def micro(v):
    return math.floor(v * 1e6 + 0.5)


def sql_model(w, b0):
    rows = [(-1, micro(b0))] + [(b, micro(w[b])) for b in range(BUCKETS)]
    vals = ",\n  ".join(
        f"(CAST({b} AS BIGINT), CAST({k} AS DOUBLE)/1000000.0)" for b, k in rows)
    return ("SELECT * FROM (VALUES\n  " + vals + ") AS t(bucket, weight)")


def sql_predict(docs, w, b0):
    vals = []
    for doc_id, text in docs:
        m = b0
        for b, x in doc_features(text):
            m = m + w[b] * x
        assert abs(m) > 1e-9, f"margin too close to zero for doc {doc_id}: {m}"
        pred = 1 if m >= 0 else 0
        vals.append(f"(CAST({doc_id} AS BIGINT), CAST({pred} AS BIGINT))")
    return ("SELECT * FROM (VALUES\n  " + ",\n  ".join(vals) +
            ") AS t(doc_id, pred)")


if __name__ == "__main__":
    con = duckdb.connect()
    docs = corpus(con)
    w, b0 = fit(docs)
    print(f"-- q_lr_model (n={N_GRAM}, buckets={BUCKETS}, iters={ITERS}, "
          f"step={STEP}, l2={L2}, label=doc_id%2)")
    print(sql_model(w, b0))
    print()
    print("-- q_lr_predict (margin-sign decisions under the model above)")
    print(sql_predict(docs, w, b0))
