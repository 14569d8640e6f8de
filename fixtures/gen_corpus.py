"""M0 — deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the engine's canonical input table per BASELINE.json
input_hint: ``(repo, path, commit, lang, content)`` where content is
synthetic source-code-ish text drawn from a Zipf(s=1.1) vocabulary of
identifiers/keywords/operators. Seeded (numpy Generator, seed=42) —
byte-identical across runs, no external data (north_rule).

One head term (``dup_guard``) is forced into ~50% of docs to exercise
the skew/salting path (SURVEY.md §5.6).

Usage: gen_corpus(n_docs) -> pandas.DataFrame; write_corpus(...) writes
parquet so Spark and DuckDB read the same bytes.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 2000
ZIPF_S = 1.1
HEAD_TERM = "dup_guard"
HEAD_DOC_FRACTION = 0.5

_LANG_EXT = {"py": "py", "c": "c", "cpp": "cpp", "java": "java", "go": "go", "rs": "rs"}
_LANGS = list(_LANG_EXT)

_KEYWORDS = [
    "def", "return", "if", "else", "for", "while", "class", "struct",
    "import", "include", "static", "const", "void", "int", "float",
    "public", "private", "match", "func", "let", "mut", "impl", "trait",
]
_STEMS = [
    "index", "merge", "scan", "hash", "join", "sort", "heap", "node",
    "tree", "list", "block", "page", "cache", "shard", "query", "score",
    "term", "doc", "post", "key", "buf", "file", "read", "write", "seek",
    "lock", "pool", "task", "spill", "codec", "delta", "varint", "bloom",
]
_SUFFIXES = ["", "_id", "_len", "_ptr", "_buf", "_cnt", "Impl", "Mgr", "er", "s"]


def _make_vocab() -> list[str]:
    """Deterministic 2000-token vocabulary: keywords + composed
    identifiers (camelCase and snake_case both present)."""
    vocab: list[str] = list(_KEYWORDS)
    rng = np.random.default_rng(SEED)
    while len(vocab) < VOCAB_SIZE:
        a = _STEMS[rng.integers(len(_STEMS))]
        b = _STEMS[rng.integers(len(_STEMS))]
        sfx = _SUFFIXES[rng.integers(len(_SUFFIXES))]
        style = rng.integers(3)
        if style == 0:
            tok = f"{a}_{b}{sfx}"
        elif style == 1:
            tok = f"{a}{b.capitalize()}{sfx}"
        else:
            tok = f"{a}{sfx}{int(rng.integers(64))}"
        if tok not in vocab:
            vocab.append(tok)
    return vocab[:VOCAB_SIZE]


def gen_corpus(n_docs: int = 2000, seed: int = SEED) -> pd.DataFrame:
    vocab = np.array(_make_vocab())
    rng = np.random.default_rng(seed)
    # Zipf(s) over vocabulary ranks, normalized (deterministic weights)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()

    doc_lens = rng.integers(30, 301, size=n_docs)
    rows = []
    for i in range(n_docs):
        lang = _LANGS[int(rng.integers(len(_LANGS)))]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/m{int(rng.integers(40))}/f{int(rng.integers(4000))}.{_LANG_EXT[lang]}"
        n_tok = int(doc_lens[i])
        # per-doc topical skew: boost a random slice of the vocabulary
        topic = int(rng.integers(0, VOCAB_SIZE - 50))
        p = probs.copy()
        p[topic : topic + 50] *= 5.0
        p /= p.sum()
        toks = list(vocab[rng.choice(VOCAB_SIZE, size=n_tok, p=p)])
        if rng.random() < HEAD_DOC_FRACTION:
            toks[int(rng.integers(n_tok))] = HEAD_TERM
        # newline every 8-12 tokens so line/snippet logic is exercisable
        out, j = [], 0
        while j < n_tok:
            step = int(rng.integers(8, 13))
            out.append(" ".join(toks[j : j + step]))
            j += step
        content = "\n".join(out)
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    df.insert(0, "doc_id", np.arange(n_docs, dtype=np.int64))
    return df


def write_corpus(out_path: str | Path, n_docs: int = 2000, seed: int = SEED) -> Path:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    gen_corpus(n_docs, seed).to_parquet(out_path, index=False)
    return out_path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    dest = sys.argv[2] if len(sys.argv) > 2 else "fixtures/corpus_tiny.parquet"
    p = write_corpus(dest, n)
    print(f"wrote {n} docs -> {p}")
