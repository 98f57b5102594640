"""DuckDB oracle SQL generators for the hash/sketch pipelines.

Each generator REPLICATES the pipeline's arithmetic in SQL — same
byte-level Horner hashes (HUGEINT mod 2^64 emulates uint64 wraparound),
same minhash permutation constants (read from the live MinHasher so the
two sides cannot drift), same banding — so the oracle equality is exact
by construction, not a recall estimate.  The char→byte identity assumes
an ASCII corpus (true of the synthetic tables; `unicode(c)` = utf-8 byte
for ASCII).

These close the `no_oracle` gaps for fingerprint, lang_id,
simhash_pairs, minhash_pairs, prefix_dfs and embedding_dedup.
"""

from __future__ import annotations

M64 = "CAST('18446744073709551616' AS HUGEINT)"  # 2^64
I63 = "CAST('9223372036854775808' AS HUGEINT)"  # 2^63
FNV = "CAST('1099511628211' AS HUGEINT)"  # shingle/band fold base


def _horner(expr: str) -> str:
    """uint64-wraparound Horner hash of a string's bytes (ASCII ==
    codepoints), matching textstats.polynomial_hash bit for bit."""
    return (
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        f"list_transform(split({expr}, ''), c -> CAST(unicode(c) AS HUGEINT))), "
        f"(a, b) -> (a * 1000003 + b) % {M64})"
    )


def _wrap64(col: str) -> str:
    """HUGEINT in [0, 2^64) → two's-complement BIGINT (numpy
    uint64.astype(int64))."""
    return f"CAST(CASE WHEN {col} >= {I63} THEN {col} - {M64} ELSE {col} END AS BIGINT)"


def fingerprint_sql() -> str:
    return (
        f"SELECT doc_id, {_wrap64('h')} AS fingerprint FROM ("
        "SELECT doc_id, CASE WHEN length(text) = 0 THEN CAST(0 AS HUGEINT) "
        f"ELSE {_horner('text')} END AS h FROM documents)"
    )


def lang_id_sql() -> str:
    """Replicates textstats.LanguageID: marker-word counts per language
    (a word shared by two marker lists credits only its FIRST owner in
    sorted-language order — index_in semantics), zh additionally counts
    CJK chars; argmax with first-of-max tie-break; 'unknown' on all-zero."""
    from elasticsearch_assets_ray.stages.textstats import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    owner: dict[str, str] = {}
    for lg in langs:
        for w in _LANG_MARKERS[lg]:
            owner.setdefault(w, lg)
    in_lists = {
        lg: ", ".join(f"'{w}'" for w in _LANG_MARKERS[lg] if owner[w] == lg)
        for lg in langs
    }
    score_cols = []
    for lg in langs:
        base = f"len(list_filter(T, x -> x IN ({in_lists[lg]})))"
        if lg == "zh":
            base += " + cjk"
        score_cols.append(f"{base} AS s_{lg}")
    # first-of-max in sorted-lang order
    cases = []
    for i, lg in enumerate(langs):
        conds = [f"s_{lg} >= s_{o}" for o in langs[i + 1 :]]
        cases.append(
            f"WHEN {' AND '.join(conds)} THEN '{lg}'" if conds else f"ELSE '{lg}'"
        )
    greatest = ", ".join(f"s_{lg}" for lg in langs)
    return (
        "WITH b AS (SELECT doc_id, lang, "
        r"regexp_split_to_array(lower(text), '[^\w一-鿿]+') AS T, "
        "len(regexp_extract_all(text, '[一-鿿]')) AS cjk FROM documents), "
        f"s AS (SELECT doc_id, lang, {', '.join(score_cols)} FROM b) "
        "SELECT doc_id, lang, CASE WHEN greatest(" + greatest + ") = 0 "
        "THEN 'unknown' " + " ".join(cases[:-1]) + " " + cases[-1] + " END AS pred_lang FROM s"
    )


def _near_dup_base_cte(n_dups: int = 20) -> str:
    """documents ∪ mutated head docs — SQL mirror of
    registry._docs_with_near_dups (words[:max(1, int(0.9·len))])."""
    return (
        "base AS (SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 100000, "
        "array_to_string((string_split(text, ' '))[1:greatest(1, "
        "CAST(floor(len(string_split(text, ' ')) * 0.9) AS INT))], ' ') "
        "FROM documents WHERE doc_id IN "
        f"(SELECT doc_id FROM documents ORDER BY doc_id LIMIT {n_dups}))"
    )


def simhash_pairs_sql(max_hamming: int = 3, n_dups: int = 20) -> str:
    """All-pairs Hamming ≤ t over SQL-computed 64-bit SimHashes.  The
    pipeline's 4×16-bit chunk banding is recall-COMPLETE for t ≤ 3
    (pigeonhole: ≤3 flipped bits leave ≥1 chunk intact), so all-pairs is
    the exact oracle."""
    pws = ", ".join(f"({b}, CAST('{1 << b}' AS HUGEINT))" for b in range(64))
    return (
        f"WITH {_near_dup_base_cte(n_dups)}, "
        "tokl AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM base), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokl GROUP BY 1, 2), "
        f"th AS (SELECT term, {_horner('term')} AS h FROM (SELECT DISTINCT term FROM tf)), "
        f"p(b, pw) AS (VALUES {pws}), "
        "bits AS (SELECT tf.doc_id, p.b, "
        "sum(tf.tf * (CASE WHEN (th.h // p.pw) % 2 = 1 THEN 1 ELSE -1 END)) AS s "
        "FROM tf JOIN th USING (term) CROSS JOIN p GROUP BY 1, 2), "
        "hh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE CAST(0 AS HUGEINT) END) AS h "
        "FROM bits JOIN p USING (b) GROUP BY doc_id), "
        f"sh AS (SELECT doc_id, {_wrap64('h')} AS v FROM hh) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.v, b.v)) <= {max_hamming} ORDER BY id_a, id_b"
    )


def _shingle_ctes() -> str:
    """tl/thl/shl CTEs: per-doc sorted-distinct k=3 token-shingle Horner
    hashes over ``base`` — the SQL mirror of dedup._shingle_hashes (short
    docs clamp the gather like the numpy kernel; empty docs → [0])."""
    sh3 = f"((TH[i] * {FNV} + TH[i+1]) % {M64} * {FNV} + TH[i+2]) % {M64}"
    return (
        "tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS L FROM base), "
        "thl AS (SELECT doc_id, list_transform(L, t -> "
        f"{_horner('t')}) AS TH FROM tl), "
        "shl AS (SELECT doc_id, list_distinct(CASE "
        "WHEN len(TH) = 0 THEN [CAST(0 AS HUGEINT)] "
        f"WHEN len(TH) = 1 THEN [((TH[1] * {FNV} + TH[1]) % {M64} * {FNV} + TH[1]) % {M64}] "
        f"WHEN len(TH) = 2 THEN [((TH[1] * {FNV} + TH[2]) % {M64} * {FNV} + TH[2]) % {M64}] "
        f"ELSE list_transform(range(1, len(TH) - 1), i -> {sh3}) END) AS SH FROM thl)"
    )


def ngram_pairs_sql(threshold: float = 0.5, n_dups: int = 20) -> str:
    """Exact oracle for the prefix-filtering similarity join: the join is
    COMPLETE for J ≥ τ > 0, and any qualifying pair shares ≥ 1 shingle,
    so the oracle needs no prefix logic at all — exact shingle-set
    Jaccard over every pair sharing any shingle, filtered to ≥ τ."""
    return (
        f"WITH {_near_dup_base_cte(n_dups)}, {_shingle_ctes()}, "
        "shr AS (SELECT doc_id, unnest(SH) AS s FROM shl), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id), "
        "jac AS (SELECT c.id_a, c.id_b, len(list_intersect(x.SH, y.SH)) AS i, "
        "len(x.SH) AS na, len(y.SH) AS nb FROM cand c "
        "JOIN shl x ON x.doc_id = c.id_a JOIN shl y ON y.doc_id = c.id_b) "
        "SELECT id_a, id_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard_sim "
        f"FROM jac WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {threshold} "
        "ORDER BY id_a, id_b"
    )


def minhash_pairs_sql(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    n_dups: int = 20,
    ctes_only: bool = False,
) -> str:
    """Full SQL replication of the MinHash-LSH pipeline: token hashes →
    k-shingle Horner hashes (short docs clamp the gather like the numpy
    kernel) → the SAME 64 permutation constants (read from the live
    MinHasher) → banded bucket keys → candidate pairs sharing ≥1 bucket →
    exact shingle-set Jaccard ≥ threshold."""
    assert shingle_k == 3, "SQL shingle expansion is generated for k=3"
    from elasticsearch_assets_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
    perms = ", ".join(
        f"({i}, CAST('{int(a)}' AS HUGEINT), CAST('{int(b)}' AS HUGEINT))"
        for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    rows_per = num_perm // bands
    ctes = (
        f"WITH {_near_dup_base_cte(n_dups)}, {_shingle_ctes()}, "
        "shr AS (SELECT doc_id, unnest(SH) AS s FROM shl), "
        f"perm(pid, a, b) AS (VALUES {perms}), "
        f"sig AS (SELECT doc_id, pid, min((a * s + b) % {M64}) AS sg "
        "FROM shr CROSS JOIN perm GROUP BY 1, 2), "
        "sigl AS (SELECT doc_id, list(sg ORDER BY pid) AS S FROM sig GROUP BY doc_id), "
        "bk AS (SELECT doc_id, bnd, list_reduce(list_prepend(CAST(bnd + 1 AS HUGEINT), "
        f"S[bnd * {rows_per} + 1 : bnd * {rows_per} + {rows_per}]), "
        f"(x, y) -> (x * {FNV} + y) % {M64}) AS key "
        f"FROM sigl, (SELECT unnest(range(0, {bands})) AS bnd)), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bk a JOIN bk b ON a.bnd = b.bnd AND a.key = b.key AND a.doc_id < b.doc_id), "
        "jac AS (SELECT c.id_a, c.id_b, len(list_intersect(x.SH, y.SH)) AS i, "
        "len(x.SH) AS na, len(y.SH) AS nb FROM cand c "
        "JOIN shl x ON x.doc_id = c.id_a JOIN shl y ON y.doc_id = c.id_b)"
    )
    if ctes_only:
        return ctes
    return (
        ctes + " SELECT id_a, id_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard_sim "
        f"FROM jac WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {threshold} "
        "ORDER BY id_a, id_b"
    )


def prefix_dfs_sql(
    alphabet: str, max_count: int = 30, max_depth: int = 12, key_col: str = "source"
) -> str:
    """The idSlicer count-guided DFS as a recursive CTE: descend a prefix
    while its count exceeds max_count (emitting an exact slice for keys
    equal to the hot prefix), emit when ≤ max_count or at max_depth,
    prune empty subtrees — the per-prefix ES count probe becomes a
    correlated COUNT."""
    chars = ", ".join(f"'{c}'" for c in alphabet)
    return (
        f"WITH RECURSIVE a(ch) AS (SELECT unnest([{chars}])), "
        "r(prefix, depth, cnt, exact_cnt) AS ("
        f"SELECT ch, 1, (SELECT count(*) FROM documents WHERE starts_with({key_col}, ch)), "
        f"(SELECT count(*) FROM documents WHERE {key_col} = ch) FROM a "
        "UNION ALL "
        "SELECT r.prefix || a.ch, r.depth + 1, "
        f"(SELECT count(*) FROM documents WHERE starts_with({key_col}, r.prefix || a.ch)), "
        f"(SELECT count(*) FROM documents WHERE {key_col} = r.prefix || a.ch) "
        f"FROM r, a WHERE r.cnt > {max_count} AND r.depth < {max_depth}) "
        "SELECT prefix, cnt, exact FROM ("
        f"SELECT prefix, CAST(cnt AS BIGINT) AS cnt, FALSE AS exact FROM r "
        f"WHERE cnt > 0 AND cnt <= {max_count} "
        "UNION ALL "
        f"SELECT prefix, CAST(cnt AS BIGINT), FALSE FROM r WHERE cnt > {max_count} AND depth = {max_depth} "
        "UNION ALL "
        f"SELECT prefix, CAST(exact_cnt AS BIGINT), TRUE FROM r "
        f"WHERE cnt > {max_count} AND depth < {max_depth} AND exact_cnt > 0"
        ") ORDER BY prefix, exact"
    )


def embedding_dedup_sql(threshold: float = 0.99, n_dups: int = 10) -> str:
    """All-pairs cosine ≥ threshold over embeddings ∪ planted exact
    duplicates.  The pipeline's LSH bucketing finds identical vectors
    with certainty (identical keys in every table), and no natural pair
    reaches the threshold in this corpus, so all-pairs is exact."""
    return (
        "WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
        "UNION ALL SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_dups})), "
        "s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "list_cosine_similarity(a.e, b.e) AS sim FROM u a JOIN u b ON a.vec_id < b.vec_id) "
        f"SELECT id_a, id_b, round(sim, 6) AS sim_r FROM s WHERE sim >= {threshold} "
        "ORDER BY id_a, id_b"
    )


def neardup_clusters_sql(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    n_dups: int = 20,
) -> str:
    """Connected components over the MinHash near-dup pair graph as a
    recursive min-label CTE: a node reaches every smaller label along
    edges; min(reached) = its component's canonical (minimum) doc_id.
    Universe = documents ∪ the synthetic dup ids, so singletons are
    their own canonical."""
    ctes = minhash_pairs_sql(
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        threshold=threshold, n_dups=n_dups, ctes_only=True,
    ).replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        ctes
        + f", pairs AS (SELECT id_a, id_b FROM jac "
        f"  WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {threshold}), "
        "ids AS (SELECT doc_id FROM base), "
        "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
        "  UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(n, label) AS ("
        "  SELECT doc_id, doc_id FROM ids "
        "  UNION "
        "  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.n "
        "  WHERE r.label < e.a), "
        "lab AS (SELECT n AS doc_id, min(label) AS canonical_id FROM reach GROUP BY n) "
        "SELECT doc_id, canonical_id, (doc_id = canonical_id) AS keep FROM lab"
    )


def _xor64(a: str, b: str) -> str:
    """uint64 XOR in the HUGEINT-[0,2^64) domain via two's-complement
    BIGINT round-trip."""
    wa = f"CAST(CASE WHEN ({a}) >= {I63} THEN ({a}) - {M64} ELSE ({a}) END AS BIGINT)"
    wb = f"CAST(CASE WHEN ({b}) >= {I63} THEN ({b}) - {M64} ELSE ({b}) END AS BIGINT)"
    x = f"CAST(xor({wa}, {wb}) AS HUGEINT)"
    return f"(CASE WHEN {x} < 0 THEN {x} + {M64} ELSE {x} END)"


def _mul64(x: str, c: int) -> str:
    """(x · c) mod 2^64 without overflowing INT128: split c into 32-bit
    halves (x·c_lo < 2^96; (x mod 2^32)·c_hi < 2^64)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"(((({x}) * {lo}) % {M64} + "
        f"(((({x}) % 4294967296) * {hi}) % 4294967296) * 4294967296) % {M64})"
    )


def _id_hash_ctes(salt: str, extra_cols: str = "") -> str:
    """CTE chain computing the splitmix64-finalized id hash as ``h``
    (staged so each splitmix64 step references its input once, keeping
    the expression linear instead of exponentially nested)."""
    z0 = _horner(f"CAST(doc_id AS VARCHAR) || ':{salt}'")
    z1 = _mul64(_xor64("z", f"(z // {1 << 30})"), 0xBF58476D1CE4E5B9)
    z2 = _mul64(_xor64("z", f"(z // {1 << 27})"), 0x94D049BB133111EB)
    z3 = _xor64("z", f"(z // {1 << 31})")
    return (
        f"h0 AS (SELECT doc_id{extra_cols}, {z0} AS z FROM documents), "
        f"h1 AS (SELECT doc_id{extra_cols}, {z1} AS z FROM h0), "
        f"h2 AS (SELECT doc_id{extra_cols}, {z2} AS z FROM h1), "
        f"hh AS (SELECT doc_id{extra_cols}, {z3} AS h FROM h2)"
    )


def mixture_sample_sql(
    epochs: dict[str, float],
    key_col: str = "lang",
    default_epochs: float = 1.0,
    salt: str = "mix",
) -> str:
    """Replicates stages.sampling.mixture_batch over documents:
    reps = floor(e[key]) + (hash(id:salt) < frac(e)·2^64), one output
    row per (doc, epoch 0..reps-1).  Thresholds are the same exact
    integers the engine computes."""
    import math

    from elasticsearch_assets_ray.stages.sampling import _threshold

    def rep_expr(e: float) -> str:
        base = int(math.floor(e))
        thr = int(_threshold(e - base))
        return (
            f"{base} + (CASE WHEN h < CAST('{thr}' AS HUGEINT) "
            "THEN 1 ELSE 0 END)"
        )

    default_arm = rep_expr(float(default_epochs))
    arms = " ".join(
        f"WHEN '{k}' THEN {rep_expr(float(epochs[k]))}"
        for k in sorted(epochs)
    )
    # a default-only mixture has no WHEN arm — CASE with zero arms is a
    # syntax error, so emit the default expression directly
    reps = f"CASE {key_col} {arms} ELSE {default_arm} END" if epochs else default_arm
    return (
        f"WITH {_id_hash_ctes(salt, extra_cols=f', {key_col}')} , "
        f"r AS (SELECT doc_id, {reps} AS reps FROM hh) "
        "SELECT d.doc_id, d.source, d.lang, unnest(range(0, r.reps)) AS epoch "
        "FROM r JOIN documents d ON d.doc_id = r.doc_id"
    )


def events_daily_hll_sql(p: int = 12) -> str:
    """Exact-by-construction SQL replica of
    ``stages.sketch.grouped_distinct_hll`` over the events table: the
    splitmix64 hash (staged ``_mul64``/``_xor64`` uint64 emulation), the
    register derivation (index = top p bits; rank = leading zeros of the
    low 64−p bits + 1, with floor(log2(low)) EXACT via
    ``length(bin(low))−1`` — string length, no float log), register-max
    per (day, index), and the estimator with the linear-counting branch.
    At gate cardinalities the linear-counting regime fires, so the final
    value is a pure function of the integer zero-register count —
    float-order independent; both sides round via floor(x + 0.5)."""
    mask = 1 << (64 - p)
    m = 1 << p
    # mirror HLL.count's alpha exactly, incl. the tabulated small-m
    # constants for p in [4, 6] (stages/sketch.py)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1.0 + 1.079 / m))
    z1 = _mul64(_xor64("z", f"(z // {1 << 30})"), 0xBF58476D1CE4E5B9)
    z2 = _mul64(_xor64("z", f"(z // {1 << 27})"), 0x94D049BB133111EB)
    z3 = _xor64("z", f"(z // {1 << 31})")
    return (
        "WITH e AS (SELECT date_trunc('day', ts) AS day, user_id "
        "FROM events WHERE user_id IS NOT NULL), "
        f"h0 AS (SELECT day, (CASE WHEN user_id < 0 THEN CAST(user_id AS "
        f"HUGEINT) + {M64} ELSE CAST(user_id AS HUGEINT) END) AS z FROM e), "
        f"h1 AS (SELECT day, {z1} AS z FROM h0), "
        f"h2 AS (SELECT day, {z2} AS z FROM h1), "
        f"hh AS (SELECT day, {z3} AS h FROM h2), "
        f"reg AS (SELECT day, CAST(h // {mask} AS BIGINT) AS idx, "
        f"CAST(h % {mask} AS BIGINT) AS low FROM hh), "
        f"rk AS (SELECT day, idx, max(CASE WHEN low = 0 THEN {64 - p + 1} "
        f"ELSE {64 - p} - (length(bin(low)) - 1) END) AS rank "
        "FROM reg GROUP BY day, idx), "
        "agg AS (SELECT day, count(*) AS present, "
        "sum(power(2.0, -rank)) AS sp FROM rk GROUP BY day), "
        f"fin AS (SELECT day, (CAST({alpha!r} AS DOUBLE) * {m}.0 * {m}.0) / "
        f"(sp + ({m} - present)) AS raw, {m} - present AS zeros FROM agg) "
        f"SELECT day, CAST(floor((CASE WHEN raw <= {2.5 * m} AND zeros > 0 "
        f"THEN {m}.0 * ln({m}.0 / zeros) ELSE raw END) + 0.5) AS BIGINT) "
        "AS n_users_approx FROM fin"
    )


def split_assign_sql(ratios: dict[str, float], salt: str = "split") -> str:
    """Replicates stages.sampling.split_batch: exact integer cumulative
    thresholds floor(cum·2^64) (last bucket absorbs rounding), label =
    first threshold with h <= T (searchsorted side='left')."""
    from elasticsearch_assets_ray.stages.sampling import _cum_thresholds

    labels, cum = _cum_thresholds(ratios)
    arms = " ".join(
        f"WHEN h <= CAST('{int(t)}' AS HUGEINT) THEN '{lab}'"
        for lab, t in zip(labels[:-1], cum[:-1])
    )
    return (
        f"WITH {_id_hash_ctes(salt)} "
        f"SELECT doc_id, CASE {arms} ELSE '{labels[-1]}' END AS split FROM hh"
    )


def stratified_sample_sql(
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> str:
    """Replicates stages.sampling.stratified_batch: keep iff
    h < floor(fraction[key]·2^64) (strict), unknown keys use the
    default fraction."""
    from elasticsearch_assets_ray.stages.sampling import _threshold

    arms = " ".join(
        f"WHEN {key_col} = '{k}' THEN CAST('{int(_threshold(p))}' AS HUGEINT)"
        for k, p in sorted(fractions.items())
    )
    dflt = int(_threshold(default_fraction))
    return (
        f"WITH {_id_hash_ctes(salt, ', ' + key_col)} "
        f"SELECT doc_id, {key_col} FROM hh "
        f"WHERE h < CASE {arms} ELSE CAST('{dflt}' AS HUGEINT) END"
    )


def dup_span_stats_sql() -> str:
    """Per-doc duplicated k=3-shingle SPAN counts over the full documents
    table — the SQL mirror of dedup.duplicated_span_stats (positional
    shingles WITH multiplicity, no within-doc dedup, docs shorter than k
    contribute no span), zero-filled via LEFT JOIN."""
    sh3 = f"((TH[i] * {FNV} + TH[i+1]) % {M64} * {FNV} + TH[i+2]) % {M64}"
    return (
        "WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS L "
        "FROM documents), "
        f"thl AS (SELECT doc_id, list_transform(L, t -> {_horner('t')}) AS TH FROM tl), "
        "sp AS (SELECT doc_id, unnest(CASE WHEN len(TH) >= 3 THEN "
        f"list_transform(range(1, len(TH) - 1), i -> {sh3}) "
        "ELSE CAST([] AS HUGEINT[]) END) AS sh FROM thl), "
        "cnt AS (SELECT sh, count(*) AS c FROM sp GROUP BY sh), "
        "per AS (SELECT sp.doc_id, "
        "  count(*) FILTER (WHERE c >= 2) AS dp, "
        "  count(DISTINCT sp.sh) FILTER (WHERE c >= 2) AS dd "
        "  FROM sp JOIN cnt USING (sh) GROUP BY sp.doc_id) "
        "SELECT t.doc_id, greatest(len(TH) - 2, 0) AS ngram_spans, "
        "coalesce(per.dp, 0) AS dup_ngram_positions, "
        "coalesce(per.dd, 0) AS distinct_dup_ngrams "
        "FROM thl t LEFT JOIN per ON per.doc_id = t.doc_id ORDER BY t.doc_id"
    )
