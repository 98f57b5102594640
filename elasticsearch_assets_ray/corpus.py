"""Deterministic synthetic source-code corpus — the ``input_hint`` table
``(repo:string, path:string, commit:string, lang:string, content:string)``
synthesized at small scale for tests and benchmarks (no external data).

Content is code-shaped: per-language line pools rendered once from a
seeded RNG, then files sample lines Zipfian-ly — giving the extremely
skewed term distribution real code has ('import'/'return'/'def' ubiquitous,
long identifier tail), which is what exercises the skew handling in the
posting merge.  Same (n_files, seed) → byte-identical table, always.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["python", "javascript", "go", "java"]

_SYLLABLES = [
    "get", "set", "run", "load", "parse", "make", "build", "read", "write",
    "merge", "split", "pack", "send", "recv", "open", "close", "init", "flush",
    "user", "item", "node", "edge", "task", "job", "queue", "cache", "index",
    "shard", "batch", "row", "col", "doc", "term", "score", "rank", "query",
    "config", "state", "store", "client", "server", "proxy", "token", "buffer",
]

_TEMPLATES = {
    "python": [
        "def {a}_{b}({c}):",
        "    return {a}.{b}({c})",
        "import {a}",
        "from {a} import {b}",
        "class {A}{B}:",
        "    self.{a} = {b}",
        "if {a} is None:",
        "    raise ValueError('{a} {b}')",
        "for {a} in {b}:",
        "    yield {a}.{c}",
        "with open({a}) as {b}:",
        "{a} = [{b} for {b} in {c}]",
        "async def {a}_{b}_{c}():",
        "    await {a}.{b}()",
        "logger.info('{a} {b} {c}')",
    ],
    "javascript": [
        "function {a}{B}({c}) {{",
        "  return {a}.{b}({c});",
        "const {a} = require('{b}');",
        "import {{ {a} }} from '{b}';",
        "export default class {A}{B} {{",
        "  this.{a} = {b};",
        "const {a} = async ({b}) => {{",
        "  await {a}.{b}();",
        "console.log('{a}', {b});",
        "let {a} = {b}.map(({c}) => {c}.{a});",
        "if ({a} === undefined) {{",
        "  throw new Error('{a} {b}');",
    ],
    "go": [
        "func {A}{B}({c} string) error {{",
        "\treturn {a}.{B}({c})",
        "import \"{a}/{b}\"",
        "type {A}{B} struct {{",
        "\t{A} string `json:\"{a}\"`",
        "if err != nil {{",
        "\treturn fmt.Errorf(\"{a} {b}: %w\", err)",
        "for _, {a} := range {b} {{",
        "var {a} = {b}.New{C}()",
        "ctx := context.Background()",
    ],
    "java": [
        "public {A}{B} {a}{B}({C} {c}) {{",
        "    return this.{a}.{b}({c});",
        "import com.{a}.{b}.{C};",
        "public class {A}{B} extends {C} {{",
        "    private final {A} {a};",
        "if ({a} == null) {{",
        "    throw new IllegalStateException(\"{a} {b}\");",
        "for ({A} {a} : {b}) {{",
        "@Override",
        "    {a}.add({b}.get{C}());",
    ],
}


def _render_pool(
    lang: str, rng: np.random.Generator, pool_size: int = 4000
) -> tuple[list[str], np.ndarray]:
    """Render a line pool; also returns each line's primary-syllable index
    (the ``a`` slot) so callers can reweight lines by syllable.  Draws
    exactly the same rng stream as always — byte-identical pools."""
    syl = _SYLLABLES
    lines = []
    a_ids = np.empty(pool_size, dtype=np.int64)
    templates = _TEMPLATES[lang]
    for n in range(pool_size):
        t = templates[rng.integers(len(templates))]
        ia, ib, ic = (rng.integers(len(syl)) for _ in range(3))
        a, b, c = syl[ia], syl[ib], syl[ic]
        a_ids[n] = ia
        lines.append(
            t.format(
                a=a, b=b, c=c,
                A=a.capitalize(), B=b.capitalize(), C=c.capitalize(),
            )
        )
    return lines, a_ids


def generate_corpus(
    n_files: int,
    seed: int = 42,
    min_lines: int = 20,
    max_lines: int = 120,
    drift_segments: int = 0,
) -> pa.Table:
    """Deterministic (repo, path, commit, lang, content) table.

    ``drift_segments > 0`` adds REGIONAL vocabulary drift: the corpus is
    split into that many contiguous segments and each (lang, segment)
    samples lines through its own pool permutation — so a term's
    frequency varies strongly by docID region, the way per-project
    vocabularies do in a crawl ordered by repository.  This is the
    regime block-max pruning exists for (regionally varying per-block
    score bounds); the default iid corpus has uniform block maxima and
    correctly gives pruning nothing to skip.  ``drift_segments=0`` is
    byte-identical to the pre-drift generator."""
    rng = np.random.default_rng(seed)
    rendered = {lang: _render_pool(lang, rng) for lang in _LANGS}
    pools = {lang: r[0] for lang, r in rendered.items()}
    n_repos = max(1, n_files // 200)

    lang_idx = rng.integers(0, len(_LANGS), n_files)
    repo_idx = rng.integers(0, n_repos, n_files)
    if drift_segments > 0:
        # a crawl ordered by repository: each repo's files are contiguous
        # in row (= docID) order, so its name token is regionally
        # concentrated — the high-idf scope terms block-max pruning skips
        # on live in few blocks instead of spanning the whole corpus
        repo_idx = np.arange(n_files, dtype=np.int64) * n_repos // n_files
    n_lines = rng.integers(min_lines, max_lines, n_files)
    commits = rng.integers(0, 2**63 - 1, n_files, dtype=np.int64)

    # Zipfian line choice: rank^-1.1 over the pool
    pool_size = 4000
    ranks = np.arange(1, pool_size + 1, dtype=np.float64)
    zipf_p = ranks**-1.1
    zipf_p /= zipf_p.sum()

    # regional drift: per-(lang, segment) line probabilities reweighted by
    # a segment-specific SYLLABLE zipf — a term common in one region is
    # rare in another (drifting whole lines isn't enough: a syllable
    # aggregates over ~270 pool lines, averaging the drift away)
    seg_p: dict[tuple[str, int], np.ndarray] = {}
    if drift_segments > 0:
        prng = np.random.default_rng(seed + 7_777_777)
        n_syl = len(_SYLLABLES)
        for lang in _LANGS:
            a_ids = rendered[lang][1]
            for s in range(drift_segments):
                perm = prng.permutation(n_syl)
                srank = np.empty(n_syl, dtype=np.float64)
                srank[perm] = np.arange(1, n_syl + 1, dtype=np.float64)
                w = zipf_p * srank[a_ids] ** -1.5
                seg_p[(lang, s)] = w / w.sum()

    repos, paths, commit_strs, langs, contents = [], [], [], [], []
    exts = {"python": "py", "javascript": "js", "go": "go", "java": "java"}
    for i in range(n_files):
        lang = _LANGS[int(lang_idx[i])]
        pool = pools[lang]
        if drift_segments > 0:
            seg = i * drift_segments // n_files
            picks = rng.choice(pool_size, size=int(n_lines[i]), p=seg_p[(lang, seg)])
        else:
            picks = rng.choice(pool_size, size=int(n_lines[i]), p=zipf_p)
        repo = f"org{int(repo_idx[i]) % 17}/repo{int(repo_idx[i])}"
        path = f"src/mod{i % 97}/file_{i}.{exts[lang]}"
        header = f"// {repo}:{path} id{i}"
        contents.append(header + "\n" + "\n".join(pool[int(p)] for p in picks))
        repos.append(repo)
        paths.append(path)
        commit_strs.append(f"{int(commits[i]):016x}")
        langs.append(lang)
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commit_strs, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_files: int,
    seed: int = 42,
    files: int = 4,
    row_group_size: int = 4096,
    overwrite: bool = False,
    min_lines: int = 20,
    max_lines: int = 120,
    drift_segments: int = 0,
) -> str:
    """Write the corpus as ``files`` parquet files (multiple row groups each
    so the partition planner has real work).  Idempotent unless overwrite."""
    marker = os.path.join(
        out_dir,
        f".corpus-{n_files}-{seed}-{files}-{min_lines}-{max_lines}-{drift_segments}",
    )
    if os.path.exists(marker) and not overwrite:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(
        n_files, seed, min_lines=min_lines, max_lines=max_lines,
        drift_segments=drift_segments,
    )
    per = (n_files + files - 1) // files
    for i in range(files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            continue
        pq.write_table(
            chunk,
            os.path.join(out_dir, f"corpus-{i:04d}.parquet"),
            row_group_size=row_group_size,
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


# Reference query set for rank-identity checks (BASELINE.json: "the
# reference query set") — pinned here, used by tests and bench.
REFERENCE_QUERIES: list[str] = [
    "import parse config",
    "return user token",
    "def load index",
    "class cache store",
    "async await client",
    "+error +return throw",
    "query score rank",
    "batch merge shard",
    "-import require module",
    "open close flush buffer",
    "context background err",
    "logger info debug",
    '"for item in items"',
    "+index -java public",
    "new instance of state",
]
