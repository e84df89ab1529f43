#!/usr/bin/env python3
"""Offline BPE merge-table learner (Sennrich et al. 2016, arXiv:1508.07909).

Learns a rank-ordered merge table from the checked-in training corpus
(scripts/bpe_train_corpus.txt — original English prose) and writes it as
TSV to src/main/resources/graft/bpe_merges_1k.tsv, one "left<TAB>right"
per line in rank order. The table is well-formed by construction: each
side is a single character or the output of an earlier merge, which is
the invariant graft.functions.Bpe.tokenCounts validates and the staged
REPLACE-chain oracle relies on.

Deterministic: word extraction is [a-z]+ over the lowercased corpus
(keeps every merge side SQL-quote-safe), pair counts are exact, and ties
break on the lexicographically largest pair. Re-running this script on
the same corpus reproduces the same table byte for byte.

Usage: python3 scripts/learn_bpe.py [n_merges]  (default 1000)
"""
import collections
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

text = (ROOT / "scripts" / "bpe_train_corpus.txt").read_text().lower()
words = collections.Counter(re.findall(r"[a-z]+", text))
vocab = {tuple(w): f for w, f in words.items()}

merges = []
while len(merges) < N:
    pairs = collections.Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += f
    if not pairs:
        break
    # max count, ties to the lexicographically largest pair — deterministic
    (a, b), _ = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
    merges.append((a, b))
    # apply left-to-right, non-overlapping — the same application rule as
    # Bpe.countWord, so learned ranks reflect what the counter will do
    new_vocab = {}
    for syms, f in vocab.items():
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        t = tuple(out)
        new_vocab[t] = new_vocab.get(t, 0) + f
    vocab = new_vocab

out = ROOT / "src" / "main" / "resources" / "graft" / "bpe_merges_1k.tsv"
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text("".join(f"{a}\t{b}\n" for a, b in merges))
print(f"learned {len(merges)} merges -> {out}")
