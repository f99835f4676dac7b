#!/usr/bin/env python3
"""Generate the golden unigram-LM (SentencePiece) vocabulary and encode
tables for the fixed fixture corpus (nation ⋈ region names — identical at
every scale factor), using an INDEPENDENT reference implementation of the
Kudo 2018 unigram trainer. The output is SQL VALUES literals to embed in
QueriesCorpus.oracles, turning the iterative EM learning into hash-exact
gates (the tools/gen_bpe_golden.py pattern).

Usage: python3 tools/gen_unigram_golden.py [sfDir]

The reference implementation mirrors the documented operator contract, not
the Scala code:
  - words   = text.strip().lower().split(); each prefixed with '▁'
  - seed    = all single code points + top `seed_size` multi-char substrings
              (length ≤ max_piece_len) by integer freq×length score, ties
              lexicographic
  - EM      = forward–backward expected counts over the distinct-word
              table; per-(word,piece) contributions quantized to 18 decimal
              places (HALF_UP) and summed EXACTLY (mirroring the engine's
              DECIMAL(38,18) shuffle-exact aggregation), M-step with a
              1e-10 floor
  - prune   = keep top-k multi-char pieces by expected_count ×
              (logp − best alternative segmentation without the piece),
              shrink 0.75 per round, chars always kept
  - output  = pieces sorted lexicographically with dense ids; Viterbi
              encode (ties: longer piece wins)
"""
import math
import sys
from decimal import Decimal, ROUND_HALF_UP, getcontext

import duckdb

getcontext().prec = 60
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
BOUNDARY = "▁"
NEG_INF = float("-inf")
QUANTUM = Decimal("1e-18")


def corpus(con):
    rows = con.execute(
        f"""SELECT n_nationkey, n_name || ' ' || r_name
            FROM '{sfdir}/nation.parquet' n
            JOIN '{sfdir}/region.parquet' r ON n_regionkey = r_regionkey
            ORDER BY n_nationkey"""
    ).fetchall()
    return [(r[0], r[1]) for r in rows]


def word_freqs(texts):
    freqs = {}
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def log_add(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    if a >= b:
        return a + math.log1p(math.exp(b - a))
    return b + math.log1p(math.exp(a - b))


def substrings(s, max_len):
    out = {}
    for i in range(len(s)):
        for l in range(1, min(max_len, len(s) - i) + 1):
            p = s[i:i + l]
            out[p] = out.get(p, 0) + 1
    return out


def seed_vocab(wf, seed_size, max_piece_len):
    counts = {}
    for w, f in wf.items():
        for p, n in substrings(BOUNDARY + w, max_piece_len).items():
            counts[p] = counts.get(p, 0) + n * f
    chars = [(p, c) for p, c in counts.items() if len(p) == 1]
    multi = [(p, c) for p, c in counts.items() if len(p) > 1]
    multi.sort(key=lambda pc: (-pc[1] * len(pc[0]), pc[0]))
    rows = chars + multi[:seed_size]
    rows.sort(key=lambda pc: pc[0])
    return rows, {p for p, _ in chars}


def forward_backward(cps, logp, max_piece_len):
    n = len(cps)
    alpha = [NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            p = "".join(cps[i - l:i])
            lp = logp.get(p, NEG_INF)
            if lp != NEG_INF and alpha[i - l] != NEG_INF:
                alpha[i] = log_add(alpha[i], alpha[i - l] + lp)
    ll = alpha[n]
    counts = {}
    if ll != NEG_INF:
        beta = [NEG_INF] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = "".join(cps[i:i + l])
                lp = logp.get(p, NEG_INF)
                if lp != NEG_INF and beta[i + l] != NEG_INF:
                    beta[i] = log_add(beta[i], lp + beta[i + l])
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = "".join(cps[i:i + l])
                lp = logp.get(p, NEG_INF)
                if lp != NEG_INF and alpha[i] != NEG_INF and beta[i + l] != NEG_INF:
                    c = math.exp(alpha[i] + lp + beta[i + l] - ll)
                    if c > 0.0:
                        counts[p] = counts.get(p, 0.0) + c
    return counts, ll


def em_round(wf, logp, max_piece_len):
    """Mirror of the engine's E/M: per-(word,piece) double contributions
    quantized to 18 decimal places HALF_UP, summed exactly; total and
    updates in piece-sorted order."""
    dec = {}
    for w, f in wf.items():
        counts, _ = forward_backward(list(BOUNDARY + w), logp, max_piece_len)
        for p, e in counts.items():
            # mirror the engine: Spark casts double->DECIMAL(38,18) via the
            # SHORTEST decimal form (Double.toString), not the exact binary
            q = Decimal(repr(e * f)).quantize(QUANTUM, rounding=ROUND_HALF_UP)
            dec[p] = dec.get(p, Decimal(0)) + q
    items = sorted(dec.items())
    counts_map = {p: float(v) for p, v in items}
    total = 0.0
    for _, v in items:
        total += float(v)
    floor = 1e-10
    updated = {p: math.log(max(counts_map.get(p, 0.0), floor) / total)
               for p in sorted(logp)}
    return updated, counts_map


def viterbi(cps, logp, max_piece_len, unk_logp):
    n = len(cps)
    best = [NEG_INF] * (n + 1)
    bk = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            p = "".join(cps[i - l:i])
            lp = logp.get(p)
            if lp is None:
                lp = unk_logp if l == 1 else NEG_INF
            if lp != NEG_INF and best[i - l] != NEG_INF:
                s = best[i - l] + lp
                if s > best[i] or (s == best[i] and l > bk[i]):
                    best[i] = s
                    bk[i] = l
    if best[n] == NEG_INF:
        return []
    out = []
    pos = n
    while pos > 0:
        l = bk[pos]
        if l == 0:
            return []
        out.append("".join(cps[pos - l:pos]))
        pos -= l
    out.reverse()
    return out


def prune_losses(logp, counts, max_piece_len):
    losses = []
    for p, lp in logp.items():
        if len(p) <= 1:
            continue
        without = {k: v for k, v in logp.items() if k != p}
        seg = viterbi(list(p), without, max_piece_len, NEG_INF)
        if not seg:
            alt = NEG_INF
        else:
            alt = sum(without.get(s, NEG_INF) for s in seg)
        c = counts.get(p, 0.0)
        loss = sys.float_info.max if alt == NEG_INF else c * (lp - alt)
        losses.append((p, loss))
    return losses


def learn(texts, vocab_size, seed_size, max_piece_len=8, em_iters=2, shrink=0.75):
    wf = word_freqs(texts)
    seed, char_pieces = seed_vocab(wf, seed_size, max_piece_len)
    w_total = 0.0
    for _, w in seed:
        w_total += float(w)
    logp = {p: math.log(w / w_total) for p, w in seed}
    char_budget = len(char_pieces)
    assert vocab_size > char_budget, "vocab_size must exceed the alphabet"
    done = False
    while not done:
        last_counts = {}
        for _ in range(em_iters):
            logp, last_counts = em_round(wf, logp, max_piece_len)
        multi = len(logp) - char_budget
        if multi <= vocab_size - char_budget:
            done = True
        else:
            keep_multi = max(vocab_size - char_budget, int(multi * shrink))
            losses = prune_losses(logp, last_counts, max_piece_len)
            losses.sort(key=lambda pl: (-pl[1], pl[0]))
            kept = {p for p, _ in losses[:keep_multi]}
            logp = {p: v for p, v in logp.items()
                    if p in char_pieces or p in kept}
    for _ in range(em_iters):
        logp, _ = em_round(wf, logp, max_piece_len)
    return logp


def encode_doc(text, logp, max_piece_len):
    unk = min(logp.values()) - 10.0
    toks = []
    for w in text.strip().lower().split():
        if w:
            toks.extend(viterbi(list(BOUNDARY + w), logp, max_piece_len, unk))
    return toks


def sql_vocab(logp):
    rows = [(p, i) for i, p in enumerate(sorted(logp))]
    vals = ",\n  ".join(f"('{p}', CAST({i} AS BIGINT))" for p, i in rows)
    return "SELECT * FROM (VALUES\n  " + vals + ") AS t(piece, piece_id)"


def sql_encode(docs, logp, max_piece_len):
    vals = []
    for doc_id, text in docs:
        toks = encode_doc(text, logp, max_piece_len)
        vals.append(
            f"(CAST({doc_id} AS BIGINT), '{' '.join(toks)}', "
            f"CAST({len(toks)} AS BIGINT))")
    return ("SELECT * FROM (VALUES\n  " + ",\n  ".join(vals) +
            ") AS t(doc_id, token_str, n_tokens)")


if __name__ == "__main__":
    con = duckdb.connect()
    docs = corpus(con)
    texts = [t for _, t in docs]
    logp = learn(texts, vocab_size=40, seed_size=40)
    print("-- learned logp (debug, not embedded):")
    for p in sorted(logp):
        print(f"--   {p!r}: {logp[p]!r}")
    print()
    print("-- q_ug_vocab (vocab_size=40, seed_size=40, max_piece_len=8)")
    print(sql_vocab(logp))
    print()
    print("-- q_ug_encode_gold (Viterbi tokens per fixture doc)")
    print(sql_encode(docs, logp, 8))
