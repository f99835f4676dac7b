#!/usr/bin/env python3
"""Generate the golden BPE merge/vocabulary tables for the fixed fixture
corpus (nation ⋈ region names — identical at every scale factor), using an
INDEPENDENT reference implementation of Sennrich-style BPE. The output is
SQL VALUES literals to embed in QueriesCorpus.oracles, turning the
iterative-learning queries from rows-only checks into hash-exact gates.

Usage: python3 tools/gen_bpe_golden.py [sfDir]

The reference implementation mirrors the documented operator contract, not
the Scala code: tokens = text.strip().lower().split() (whitespace split);
each round merges the globally most frequent adjacent symbol pair, ties
broken lexicographically on (left, right); greedy left-to-right pair
rewrite inside each word; stop below min_pair_count.
"""
import sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
END = "</w>"


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


def encode_word(word, ranks, byte_level=False):
    """Mirror of the documented encode contract: repeatedly merge the
    LOWEST-RANK adjacent pair present (all its occurrences in one pass)
    until none applies."""
    syms = decompose(word, byte_level)
    while len(syms) >= 2:
        best, bestr = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (bestr is None or r < bestr):
                bestr, best = r, (a, b)
        if best is None:
            break
        syms = merge_pair(syms, *best)
    return syms


def decompose(word, byte_level):
    if byte_level:
        return [f"{b:02x}" for b in word.encode("utf-8")] + [END]
    return list(word) + [END]


def merge_pair(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn(texts, num_merges, byte_level, min_pair_count=2):
    vocab = [(f, decompose(w, byte_level)) for w, f in word_freqs(texts).items()]
    merges = []
    while len(merges) < num_merges:
        counts = {}
        for f, syms in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        live = {p: c for p, c in counts.items() if c >= min_pair_count}
        if not live:
            break
        (l, r), c = min(live.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((len(merges), l, r, c))
        vocab = [(f, merge_pair(syms, l, r)) for f, syms in vocab]
    return merges


def vocabulary(texts, merges):
    chars = set()
    for w in word_freqs(texts):
        chars.update(list(w))
    base = sorted(chars | {END})
    rows = [(t, i) for i, t in enumerate(base)]
    rows += [(l + r, len(base) + rank) for rank, l, r, _ in merges]
    return rows


def sql_merges(merges):
    vals = ",\n  ".join(
        f"(CAST({k} AS INTEGER), '{l}', '{r}', CAST({c} AS BIGINT))"
        for k, l, r, c in merges)
    return ("SELECT * FROM (VALUES\n  " + vals +
            ") AS t(rank, left_sym, right_sym, pair_count)")


def sql_vocab(rows):
    vals = ",\n  ".join(f"('{t}', CAST({i} AS BIGINT))" for t, i in rows)
    return "SELECT * FROM (VALUES\n  " + vals + ") AS t(token, token_id)"


def sql_encode(docs, merges):
    ranks = {(l, r): k for k, l, r, _ in merges}
    vals = []
    for doc_id, text in docs:
        toks = []
        for w in text.strip().lower().split():
            if w:
                toks.extend(encode_word(w, ranks))
        vals.append(
            f"(CAST({doc_id} AS BIGINT), '{' '.join(toks)}', "
            f"CAST({len(toks)} AS BIGINT))")
    return ("SELECT * FROM (VALUES\n  " + ",\n  ".join(vals) +
            ") AS t(doc_id, token_str, n_tokens)")


if __name__ == "__main__":
    con = duckdb.connect()
    docs = corpus(con)
    texts = [t for _, t in docs]
    char_merges = learn(texts, 16, byte_level=False)
    byte_merges = learn(texts, 16, byte_level=True)
    print("-- q_bpe_merges_gold (char-level, 16 merges)")
    print(sql_merges(char_merges))
    print()
    print("-- q_bpe_merges_gold_bytes (byte-level, 16 merges)")
    print(sql_merges(byte_merges))
    print()
    print("-- q_bpe_vocab_gold (char-level base + 16 merge products)")
    print(sql_vocab(vocabulary(texts, char_merges)))
    print()
    print("-- q_bpe_encode_gold (char-level tokens per fixture doc)")
    print(sql_encode(docs, char_merges))
