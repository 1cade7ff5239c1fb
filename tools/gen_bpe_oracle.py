#!/usr/bin/env python3
"""Independent BPE ground truth for the q_bpe_merges / q_bpe_tokenize
oracles (the same reference-ground-truth move as the A12 parity file).

Implements the textbook BPE trainer/encoder over the documents table —
nothing shared with the Scala implementation:
  - words: split on ASCII whitespace (Java regex \\s semantics), drop
    empty tokens; frequency-weighted symbol dictionary
  - 16 merge rounds; argmax pair by (count DESC, left ASC, right ASC);
    merges applied left-to-right, non-overlapping
  - tokenize: encode each unique word under the trained merges, fan the
    per-word token count back onto the corpus, aggregate per doc

Writes oracles/bpe_merges_sf001.parquet and
oracles/bpe_tokenize_sf001.parquet; the oracle SQL SELECTs them (the
fractional tokens_per_word column is derived in SQL, mirroring the
Spark-side round(x, 4), so no float is baked into the files).

Usage: python3 tools/gen_bpe_oracle.py [sfDir] [outDir]
"""
import re
import sys
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

NUM_MERGES = 16
ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def words_of(text):
    return [w for w in ASCII_WS.split(text) if w != ""]


def merge_word(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(freqs, num_merges):
    dic = [(list(w), f) for w, f in freqs.items()]
    merges = []
    for rank in range(num_merges):
        counts = Counter()
        for syms, f in dic:
            if len(syms) >= 2:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, left + right, cnt))
        dic = [(merge_word(syms, left, right), f) for syms, f in dic]
    return merges


def encode_len(word, merges):
    syms = list(word)
    for _, left, right, _, _ in merges:
        syms = merge_word(syms, left, right)
    return len(syms)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "oracles"
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freqs = Counter()
    per_doc_words = {}
    for doc_id, text in docs:
        ws = words_of(text)
        per_doc_words[doc_id] = ws
        freqs.update(ws)
    merges = train(freqs, NUM_MERGES)
    tok_len = {w: encode_len(w, merges) for w in freqs}

    import os
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "cnt": pa.array([m[4] for m in merges], pa.int64()),
    }), f"{out_dir}/bpe_merges_sf001.parquet")

    doc_ids = sorted(per_doc_words)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "n_words": pa.array(
            [len(per_doc_words[d]) for d in doc_ids], pa.int64()),
        "n_bpe_tokens": pa.array(
            [sum(tok_len[w] for w in per_doc_words[d]) for d in doc_ids],
            pa.int64()),
    }), f"{out_dir}/bpe_tokenize_sf001.parquet")
    print(f"{len(merges)} merges, {len(doc_ids)} docs -> {out_dir}/")
    for m in merges[:5]:
        print("  ", m)


if __name__ == "__main__":
    main()
