#!/usr/bin/env python3
"""Generate the golden WordPiece merge/vocabulary/encode tables for the
fixed fixture corpus (nation ⋈ region names — identical at every scale
factor), using an INDEPENDENT reference implementation of the documented
contract (the gen_bpe_golden.py pattern).

Usage: python3 tools/gen_wordpiece_golden.py [sfDir]

Contract mirrored (not the Scala code):
  - words = text.strip().lower().split(); decomposition: first code point
    bare, the rest '##'-prefixed; no end-of-word marker
  - each round merges the pair maximizing cnt / (float(lc) * float(rc))
    (that exact IEEE op order), ties (l, r) lexicographic; stop below
    min_pair_count = 2; merge product = l + r-without-##
  - vocabulary: sorted base symbols + [UNK] first, merge products at
    |base| + rank
  - encode: BERT greedy longest-match-first; any uncoverable position
    maps the WHOLE word to [UNK]
"""
import sys

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CONT = "##"
UNK = "[UNK]"


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


def wp_syms(word):
    cps = list(word)
    return [c if i == 0 else CONT + c for i, c in enumerate(cps)]


def product(l, r):
    return l + (r[len(CONT):] if r.startswith(CONT) else r)


def merge_pair(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(product(l, r))
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn(texts, num_merges, min_pair_count=2):
    vocab = [(f, wp_syms(w)) for w, f in word_freqs(texts).items()]
    merges = []
    while len(merges) < num_merges:
        pair_cnt, sym_cnt = {}, {}
        for f, syms in vocab:
            for s in syms:
                sym_cnt[s] = sym_cnt.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + f
        live = {p: c for p, c in pair_cnt.items() if c >= min_pair_count}
        if not live:
            break
        best, best_key = None, None
        for (l, r), c in live.items():
            score = c / (float(sym_cnt[l]) * float(sym_cnt[r]))
            key = (-score, l, r)
            if best_key is None or key < best_key:
                best_key, best = key, (l, r, c)
        l, r, c = best
        merges.append((len(merges), l, r, c))
        vocab = [(f, merge_pair(syms, l, r)) for f, syms in vocab]
    return merges


def vocabulary(texts, merges):
    base = set()
    for w in word_freqs(texts):
        base.update(wp_syms(w))
    base_sorted = sorted(base | {UNK})
    rows = [(t, i) for i, t in enumerate(base_sorted)]
    rows += [(product(l, r), len(base_sorted) + k) for k, l, r, _ in merges]
    return rows


def encode_word(word, tokens, max_len):
    cps = list(word)
    out, pos = [], 0
    while pos < len(cps):
        prefix = "" if pos == 0 else CONT
        ln = min(max_len, len(cps) - pos)
        found = None
        while found is None and ln >= 1:
            cand = prefix + "".join(cps[pos:pos + ln])
            if cand in tokens:
                found = cand
            else:
                ln -= 1
        if found is None:
            return [UNK]
        out.append(found)
        pos += ln
    return out


def sql_merges(merges):
    vals = ",\n  ".join(
        f"(CAST({k} AS INTEGER), '{l}', '{r}', CAST({c} AS BIGINT))"
        for k, l, r, c in merges)
    return ("SELECT * FROM (VALUES\n  " + vals +
            ") AS t(rank, left_sym, right_sym, pair_count)")


def sql_vocab(rows):
    vals = ",\n  ".join(f"('{t}', CAST({i} AS BIGINT))" for t, i in rows)
    return "SELECT * FROM (VALUES\n  " + vals + ") AS t(token, token_id)"


def sql_encode(docs, vocab_rows):
    tokens = {t for t, _ in vocab_rows}
    max_len = max(len(t[len(CONT):] if t.startswith(CONT) else t) for t in tokens)
    vals = []
    for doc_id, text in docs:
        toks = []
        for w in text.strip().lower().split():
            if w:
                toks.extend(encode_word(w, tokens, max_len))
        vals.append(
            f"(CAST({doc_id} AS BIGINT), '{' '.join(toks)}', "
            f"CAST({len(toks)} AS BIGINT))")
    return ("SELECT * FROM (VALUES\n  " + ",\n  ".join(vals) +
            ") AS t(doc_id, token_str, n_tokens)")


if __name__ == "__main__":
    con = duckdb.connect()
    docs = corpus(con)
    texts = [t for _, t in docs]
    merges = learn(texts, 16)
    vocab = vocabulary(texts, merges)
    print("-- q_wp_merges (16 likelihood-ratio merges)")
    print(sql_merges(merges))
    print()
    print("-- q_wp_vocab (base + [UNK] + merge products)")
    print(sql_vocab(vocab))
    print()
    print("-- q_wp_encode_gold (greedy longest-match per fixture doc)")
    print(sql_encode(docs, vocab))
