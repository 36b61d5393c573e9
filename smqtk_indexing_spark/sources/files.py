"""Deterministic synthetic `files` corpus with planted ground truth.

Shape per BASELINE.json input_hint:
``files(repo:string, path:string, commit:string, lang:string, content:string)``
plus a ``doc_id`` surrogate key. Planted structure per FIXTURES.md F1
(seeded, reproducible — reference convention of a ``random_seed`` on every
stochastic component, ``impls/lsh_functor/itq.py:150``):

- exact clones under different (repo, path)  -> sha256 fast-path targets
- near clones with 1-10%% token edits         -> MinHash/Jaccard targets
- substring containments (wrapped copies)    -> CDC/suffix-array targets
- boilerplate micro-docs shared by many rows -> giant-bucket skew case
- negatives (pairwise Jaccard < ~0.3)

Returns (files_pdf, truth_pairs_pdf) as pandas; `as_spark` wraps them.
Used by tests (recall gate) and bench.py (scaling runs) — never by the
driver correctness oracle, which runs on /root/testdata parquet.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_KEYWORDS = (
    "def return if else for while import class try except with lambda yield "
    "assert raise pass break continue global print len range map filter zip "
    "int str list dict set tuple float bool none true false self init main "
    "args kwargs value key item index count total result data node left right"
).split()

LANGS = ["py", "java", "c", "js", "go"]
# one lang ~50% of rows to exercise partition skew (FIXTURES.md F1)
_LANG_P = [0.5, 0.2, 0.12, 0.1, 0.08]


def _doc(rng: np.random.Generator, n_tokens: int) -> str:
    idx = rng.integers(0, len(_KEYWORDS), size=n_tokens)
    return " ".join(_KEYWORDS[i] for i in idx)


def _edit(rng: np.random.Generator, text: str, frac: float) -> str:
    toks = text.split()
    n_edit = max(1, int(len(toks) * frac))
    pos = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
    for p in pos:
        toks[int(p)] = f"ident{int(rng.integers(0, 10_000))}"
    return " ".join(toks)


def synth_files(
    n: int = 2000, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate n rows; ~78%% negatives, 5%% exact clones, 10%% near clones,
    3%% containments, plus a boilerplate block. Truth pairs carry a `kind`
    in {exact, near, substr}."""
    rng = np.random.default_rng(seed)
    n_exact = max(1, int(n * 0.05))
    n_near = max(1, int(n * 0.10))
    n_sub = max(1, int(n * 0.03))
    n_boiler = max(4, int(n * 0.02))
    n_base = n - n_exact - n_near - n_sub - n_boiler

    contents: list[str] = []
    truth: list[tuple[int, int, str]] = []

    for _ in range(n_base):
        contents.append(_doc(rng, int(rng.integers(40, 400))))

    base_n = len(contents)
    # exact clones of random base docs
    for i in range(n_exact):
        src = int(rng.integers(0, base_n))
        truth.append((src, len(contents), "exact"))
        contents.append(contents[src])
    # near clones: 1-10% token edits
    for i in range(n_near):
        src = int(rng.integers(0, base_n))
        frac = float(rng.uniform(0.01, 0.10))
        truth.append((src, len(contents), "near"))
        contents.append(_edit(rng, contents[src], frac))
    # substring containments: base doc wrapped in extra text
    for i in range(n_sub):
        src = int(rng.integers(0, base_n))
        pre = _doc(rng, int(rng.integers(5, 30)))
        post = _doc(rng, int(rng.integers(5, 30)))
        truth.append((src, len(contents), "substr"))
        contents.append(f"{pre} {contents[src]} {post}")
    # boilerplate: one tiny license header shared by many rows (skew case)
    header = "copyright license permission notice warranty merchantability"
    first_boiler = len(contents)
    for i in range(n_boiler):
        if i > 0:
            truth.append((first_boiler, len(contents), "exact"))
        contents.append(header)

    n_rows = len(contents)
    langs = rng.choice(LANGS, size=n_rows, p=_LANG_P)
    repos = [f"repo{int(r)}" for r in rng.integers(0, 20, size=n_rows)]
    files = pd.DataFrame(
        {
            "doc_id": np.arange(n_rows, dtype=np.int64),
            "repo": repos,
            "path": [
                f"src/m{int(rng.integers(0, 50))}/f{i}.{langs[i]}"
                for i in range(n_rows)
            ],
            "commit": [
                hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12]
                for i in range(n_rows)
            ],
            "lang": langs,
            "content": contents,
        }
    )
    truth_pairs = pd.DataFrame(
        {
            "a": np.array([min(a, b) for a, b, _ in truth], dtype=np.int64),
            "b": np.array([max(a, b) for a, b, _ in truth], dtype=np.int64),
            "kind": [k for _, _, k in truth],
        }
    )
    return files, truth_pairs


def as_spark(spark, n: int = 2000, seed: int = 42):
    files, truth = synth_files(n, seed)
    return (
        spark.createDataFrame(files),
        spark.createDataFrame(truth),
    )
