"""Text-analysis expression builders (JVM-side, no Python UDFs).

Everything here returns Spark ``Column``s built from SQL expressions
so the hot path stays inside whole-stage codegen. The char-level
polynomial hash is an exact-integer left fold, giving bit parity with
the DuckDB oracle (which uses ``list_reduce`` — also a left fold).

Generalizes the reference's scalar text utilities
(`src/utils/string.ts:51-120`, `calculate-fields.ts:341-403`) to the
LLM-pipeline operators mandated by the project brief.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import Column
from pyspark.sql import functions as F

from .constants import CHAR_SEED, CJK_PATTERN, LANG_STOPWORDS, MOD, SHINGLE_N


def norm_text(col: str = "text") -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace.

    Mirrors ``normalizeString`` (`src/utils/string.ts:51-59`).
    """
    return F.expr(
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', ' '), ' +', ' '))"
    )


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of the normalized text (empty strings dropped)."""
    nt = (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', ' '), ' +', ' '))"
    )
    return F.expr(f"filter(split({nt}, ' '), x -> x <> '')")


def shingles(tokens_col: str, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles from a token-array column."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({tokens_col}) - {n}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i + 1, {n})))) "
        f"ELSE array() END"
    )


#: ordered (pattern, replacement) chain for markup stripping — shared
#: with the DuckDB oracle so both engines run the literal same regexes
#: in the same order (RE2-compatible: no backrefs or lookaround).
MARKUP_STRIP_STEPS = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    # &amp; decodes LAST among entities so escaped entities don't
    # double-decode ('&amp;lt;' must yield '&lt;', not '<').
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def strip_markup(col: str) -> Column:
    """HTML/markup boilerplate removal (the C4-style cleanup step
    before any text analysis): drop script/style/comment blocks, strip
    tags, decode the common entities, collapse whitespace. Pure
    ordered regexp_replace chain in codegen — no parser, no UDF;
    good-enough-for-corpus-cleaning by design (a full HTML5 parser is
    a different tool)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in MARKUP_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def ngrams(tokens_col: str, n: int) -> Column:
    """Word n-grams WITH multiplicity from a token-array column.

    Unlike :func:`shingles` (distinct, for set-overlap dedup), this
    keeps every occurrence — the repetition-analysis ops need the
    counts (Gopher-style duplicate/top n-gram fractions).
    """
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"transform(sequence(0, size({tokens_col}) - {n}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i + 1, {n}))) "
        f"ELSE array() END"
    )


def poly_hash(col: str) -> Column:
    """Exact-integer polynomial rolling hash of a string column.

    ``h = fold(chars, seed, (a, c) -> (a*31 + ascii(c)) % MOD)`` —
    deterministic and engine-portable (no murmur/xxhash dependency).
    """
    return F.expr(
        f"aggregate(split({col}, ''), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {MOD})"
    )


#: lazily-built singleton for :func:`poly_hash_q_col`.
_POLY_HASH_UDF = None


def poly_hash_q_col(col) -> Column:
    """:func:`poly_hash` as ONE vectorized Arrow/numpy column (round
    13, guide §4.2) — bit-identical values, computed per Arrow batch
    instead of per row through the interpreted ``aggregate`` HOF.

    Why: the char-level fold runs once per SHINGLE (≈260k rows at
    sf0.1), and higher-order array functions are CodegenFallback.
    Measured (tools/probe_polyhash_ab.py, interleaved medians at
    sf0.1/local[32]): the minhash signature stage 1.108 → 0.691 s,
    with 0 mismatches over the full 260k-shingle corpus.

    EXACTNESS: the left fold h ← (h·31 + ascii(c)) % MOD has the
    closed form h(s) = (seed·31^L + Σ c_i·31^(L−1−i)) mod MOD; every
    product stays < 2^37 and segment sums < 2^63 for strings up to
    ~2^25 chars — pure int64. ASCII-contract inputs only (normalized
    text / shingles / tokens); the encode hard-fails on anything else
    rather than drifting from the oracle. NULL in → NULL out; empty
    string folds to seed % MOD exactly like the SQL aggregate over an
    empty array.
    """
    global _POLY_HASH_UDF
    if _POLY_HASH_UDF is None:
        seed, mod = CHAR_SEED, MOD

        # self-contained closure: workers need no repo imports
        def _poly(s: pd.Series) -> pd.Series:
            import numpy as np
            import pandas as pd

            mask = s.notna().to_numpy()
            vals = s[mask]
            out = np.zeros(len(s), dtype=np.int64)
            if len(vals):
                lens = vals.str.len().to_numpy(np.int64)
                arr = np.frombuffer(
                    "".join(vals.tolist()).encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                maxlen = int(lens.max())
                pw = np.ones(maxlen + 1, dtype=np.int64)
                for k in range(1, maxlen + 1):
                    pw[k] = (pw[k - 1] * 31) % mod
                starts = np.zeros(len(vals) + 1, dtype=np.int64)
                np.cumsum(lens, out=starts[1:])
                pos = np.arange(len(arr), dtype=np.int64) - np.repeat(
                    starts[:-1], lens
                )
                expo = np.repeat(lens, lens) - 1 - pos
                terms = (arr * pw[expo]) % mod
                seg = np.zeros(len(vals), dtype=np.int64)
                nz = lens > 0
                if nz.any() and len(terms):
                    seg[nz] = np.add.reduceat(terms, starts[:-1][nz]) % mod
                out[mask] = ((seed % mod) * pw[lens] + seg) % mod
            res = pd.Series(out)
            res[~mask] = None
            return res

        _POLY_HASH_UDF = F.pandas_udf(_poly, "long")
    return _POLY_HASH_UDF(col)


def ws_token_count(col: str = "text") -> Column:
    """Whitespace token count over the raw text."""
    return F.expr(f"size(filter(split({col}, '\\\\s+'), x -> x <> ''))")


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-ish subword proxy: count of word-piece + punctuation matches.

    A word of length L contributes ceil(L/4) pieces (≈ GPT-style 4
    chars/token); punctuation marks count one each.
    """
    return F.expr(
        f"aggregate(regexp_extract_all({col}, '\\\\w+|[^\\\\w\\\\s]', 0), "
        f"CAST(0 AS BIGINT), (a, t) -> a + CAST(ceil(length(t) / 4.0) AS BIGINT))"
    )


def stopword_hits(tokens_col: str, lang: str) -> Column:
    """Count of tokens (with multiplicity) in ``lang``'s stopword list."""
    words = LANG_STOPWORDS[lang]
    if not words:
        return F.lit(0)
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter({tokens_col}, x -> array_contains(array({arr}), x)))"
    )


def lang_id(text_col: str, tokens_col: str) -> Column:
    """n-gram-heuristic language ID: CJK codepoints → zh, else argmax
    stopword hits with fixed precedence (en, de, es, fr) on ties,
    else 'und'. A CASE chain in precedence order — ties resolve to the
    first branch — so the DuckDB oracle is the literal same CASE.
    """
    langs = ("en", "de", "es", "fr")
    scores = {lang: stopword_hits(tokens_col, lang) for lang in langs}
    chain = F.when(F.expr(f"{text_col} RLIKE '{CJK_PATTERN}'"), F.lit("zh"))
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        chain = chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def bigram_fluency(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style statistical fluency screen (Wenzek et al. 2020
    filter web text by KenLM perplexity; this is the exact-integer
    analogue): each document is scored by how predictable its token
    stream is under the corpus's OWN bigram model — per-bigram
    conditional frequency 10000·c(w1,w2) div c(w1·) in basis points,
    floor-averaged per document. Typical prose scores high; gibberish,
    shuffled word salad, and tokens glued from unrelated corpora
    score low. All integer arithmetic → bit-replayable by the oracle
    (a float log-prob LM never is).

    Scale shape (round 12, guide §2.3/§2.4): one explode to the
    bigram stream, ONE (w1, w2) hash agg for the model counts; the
    unigram-context count is DERIVED from the model table —
    c1(w1) = Σ_{w2} c2(w1, w2), a window over the vocab²-bounded c2
    frame — instead of a second full agg over the bigram stream, and
    the stream is joined back once on (w1, w2) carrying the finished
    p_bp (before: two corpus-sized aggs + two corpus-sized joins).
    No floats, no UDFs, no driver collect; at 100 TB the bigram
    model is a table, not a broadcast.

    Returns (doc, n_bigrams, fluency_bp); docs with < 2 tokens score
    (0, 0).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    pairs = (
        "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
        "i -> struct(element_at(t, i + 1) AS w1, element_at(t, i + 2) AS w2)) "
        "ELSE CAST(array() AS array<struct<w1: string, w2: string>>) END"
    )
    bi = toks.select("doc", F.explode(F.expr(pairs)).alias("b")).select(
        "doc", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    model = c2.withColumn(
        "c1", F.sum("c2").over(Window.partitionBy("w1"))
    ).select("w1", "w2", F.expr("(10000 * c2) div c1").alias("p_bp"))
    scored = bi.join(model, ["w1", "w2"])
    per_doc = scored.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr("sum(p_bp) div count(*)").cast("long").alias("fluency_bp"),
    )
    return (
        toks.select("doc")
        .join(per_doc, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("fluency_bp", F.lit(0)).cast("long").alias("fluency_bp"),
        )
    )


#: Gopher required stopwords (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher", quality-filter appendix — public): a document
#: must contain at least GOPHER_MIN_STOPWORDS distinct ones.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_stat_cols(text_col: str = "text") -> list[Column]:
    """The per-row integer counters the Gopher battery is decided
    from, as named Columns (``n_words``, ``sum_word_len``,
    ``n_symbols``, ``n_lines``, ``n_bullet``, ``n_ellipsis``,
    ``n_alpha_words``, ``n_stopwords``) — pure map-side expressions,
    composable onto any projection that carries ``text_col`` (round
    12: lets tp2/tp3 inline the screens instead of joining
    :func:`gopher_rules` back on doc id; guide §2.4)."""
    sw = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    exprs = {
        "w": f"filter(split({text_col}, '\\\\s+'), x -> x <> '')",
        "lines": f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), l -> l <> '')",
    }
    return [
        F.expr(f"size({exprs['w']})").cast("long").alias("n_words"),
        F.expr(
            f"aggregate({exprs['w']}, 0L, (a, x) -> a + length(x))"
        ).alias("sum_word_len"),
        (
            F.expr(f"length({text_col}) - length(replace({text_col}, '#', ''))")
            + F.expr(
                f"CAST((length({text_col}) - length(replace({text_col}, '...', ''))) / 3 AS BIGINT)"
            )
        ).cast("long").alias("n_symbols"),
        F.expr(f"size({exprs['lines']})").cast("long").alias("n_lines"),
        F.expr(
            f"size(filter({exprs['lines']}, l -> substring(l, 1, 1) IN ('•', '-', '*')))"
        ).cast("long").alias("n_bullet"),
        F.expr(
            f"size(filter({exprs['lines']}, l -> l LIKE '%...' OR l LIKE '%…'))"
        ).cast("long").alias("n_ellipsis"),
        F.expr(
            f"size(filter({exprs['w']}, x -> x rlike '[A-Za-z]'))"
        ).cast("long").alias("n_alpha_words"),
        F.expr(
            f"size(array_intersect(array_distinct(filter(split(lower({text_col}), "
            f"'\\\\s+'), x -> x <> '')), array({sw})))"
        ).cast("long").alias("n_stopwords"),
    ]


def gopher_flag_cols() -> list[Column]:
    """The Gopher verdict booleans (``ok_*``) computed from the
    :func:`gopher_stat_cols` counter columns — exact integer
    cross-multiplications, identical to :func:`gopher_rules`'s."""
    return [
        (
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS)
        ).alias("ok_word_count"),
        (
            (3 * F.col("n_words") <= F.col("sum_word_len"))
            & (F.col("sum_word_len") <= 10 * F.col("n_words"))
        ).alias("ok_word_len"),
        (10 * F.col("n_symbols") < F.col("n_words")).alias("ok_symbol_ratio"),
        (
            (10 * F.col("n_bullet") <= 9 * F.col("n_lines"))
            & (10 * F.col("n_ellipsis") <= 3 * F.col("n_lines"))
        ).alias("ok_bullet_ellipsis"),
        (5 * F.col("n_alpha_words") >= 4 * F.col("n_words")).alias("ok_alpha_words"),
        (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS).alias("ok_stopwords"),
    ]


def gopher_rules(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher document-level quality rule battery (Rae et al. 2021)
    as one map-side codegen pass — per-doc booleans plus the overall
    keep flag. Complements ta5's repetition signals (the other half
    of the Gopher filter set).

    Every ratio rule is an exact INTEGER cross-multiplication (e.g.
    "mean word length in [3,10]" is ``3·W ≤ Σlen ≤ 10·W``), so the
    DuckDB oracle replays each verdict bit-for-bit — no float
    thresholds under the gate. Rules:

    1. word count in [50, 100000];
    2. mean word length in [3, 10] characters;
    3. symbol-to-word ratio ('#' chars + '...' runs) < 10%;
    4. ≤90% of lines start with a bullet AND ≤30% end with an
       ellipsis;
    5. ≥80% of words contain at least one alphabetic character;
    6. ≥2 distinct required stopwords present.

    Scale shape: no shuffle at all — pure per-row expressions; at
    100 TB this is a free rider on whatever scan feeds it.
    """
    stats = df.select(F.col(id_col).alias("doc"), *gopher_stat_cols(text_col))
    out = stats.select("doc", "n_words", *gopher_flag_cols())
    return out.withColumn(
        "pass_all",
        F.col("ok_word_count")
        & F.col("ok_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_bullet_ellipsis")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


def char_entropy_expr(s_col: str) -> str:
    """``ent_q`` for one normalized-text string column, as ONE
    self-contained per-row SQL expression: ``n·ilog2_q(n) −
    Σ c·ilog2_q(c)`` over the character histogram of ``s_col``.

    Shape (round 12, guide §2.4): sort the character array, find the
    run BOUNDARY positions (one comparison per character), then fold
    the per-run lengths through :func:`.selection.ilog2_q_expr` — the
    expensive ilog2 runs once per DISTINCT character, not per
    character, and the whole histogram lives inside the row. This
    replaces the explode → (doc, ch) count → doc sum pipeline, i.e.
    two full shuffles of one-row-per-CHARACTER data, with zero
    shuffles; at 100 TB the old shape shuffled ~8× the corpus bytes
    twice, the new one is a free rider on the scan.

    ANSI-safety: every ``element_at`` sits under a CASE guard (Spark 4
    ANSI mode errors on out-of-range indices; OR does not guarantee
    short-circuit). Contract: the string is non-empty (callers filter
    empty normalized text first — the explode shape dropped those
    docs implicitly).
    """
    from .selection import ilog2_q_expr  # noqa: PLC0415 — avoid cycle at import

    # run boundary i (1-based): last position, or char != next char
    bounds = (
        "filter(sequence(1, size(sa)), i -> CASE WHEN i = size(sa) THEN true "
        "ELSE element_at(sa, i) <> element_at(sa, i + 1) END)"
    )
    run_len = (
        "CAST(element_at(bs, j) - CASE WHEN j = 1 THEN 0 "
        "ELSE element_at(bs, j - 1) END AS BIGINT)"
    )
    per_run = f"transform(array({run_len}), cc -> cc * ({ilog2_q_expr('cc')}))[0]"
    return (
        f"transform(array(array_sort(filter(split({s_col}, ''), c -> c <> ''))), sa -> "
        f"transform(array({bounds}), bs -> "
        f"CAST(size(sa) AS BIGINT) * ({ilog2_q_expr('size(sa)')}) "
        f"- aggregate(sequence(1, size(bs)), CAST(0 AS BIGINT), "
        f"(acc2, j) -> acc2 + {per_run})"
        f")[0])[0]"
    )


#: lazily-built singleton for :func:`char_entropy_q_col` — creating a
#: pandas_udf wrapper per query build is pure driver overhead.
_ENT_Q_UDF = None


def char_entropy_q_col(s_col) -> Column:
    """``ent_q`` for a NORMALIZED-text string column as ONE vectorized
    Arrow/numpy column (round 13, guide §4.2): the exact-integer
    ``n·ilog2_q(n) − Σ c·ilog2_q(c)`` over the per-row character
    histogram, computed on whole Arrow batches in NumPy int64 instead
    of the per-row interpreted HOF fold of :func:`char_entropy_expr`.

    Why: higher-order array functions (``aggregate``/``transform``)
    are CodegenFallback — interpreted per row — and the 20-step
    square-and-compare ilog2 runs once per distinct character per row,
    ~760 interpreted lambda evaluations per document. Measured at
    sf0.1/local[32] (tools/probe_entropy_ab.py, interleaved medians):
    JVM fold 1.885 s → numpy UDF 0.444 s on the ta10 shape, with the
    full-corpus compare showing 0 mismatches. At 100 TB the column
    stays a free rider on the scan — an ArrowEvalPython projection is
    embarrassingly parallel, no shuffle, and only the one normalized
    string column crosses the JVM↔Python boundary (§4.1).

    EXACTNESS: all arithmetic is int64 (c ≤ n < 2^53 by the
    string-length contract; y < 2^31 so y² < 2^62); the ilog2 kernel
    is the literal numpy transcription of ``selection.ilog2_q``
    (property-tested equal in tests/test_selection.py, including the
    frexp exponent correction at exact powers of two). The histogram
    is over raw bytes — valid because ``norm_text`` output is pure
    ASCII ``[a-z0-9 ]`` (the encode below hard-fails otherwise rather
    than drifting). NULL in → NULL out; empty strings are the
    caller's filter contract exactly as with the expression fold.
    """
    global _ENT_Q_UDF
    if _ENT_Q_UDF is None:
        # Self-contained closure (the similarity.py mapInPandas
        # discipline): workers need no repo imports.
        def _ilog2_q_vec(x, q: int = 20, f: int = 30):
            import numpy as np

            x = x.astype(np.int64)
            _, e = np.frexp(x.astype(np.float64))
            p = (e - 1).astype(np.int64)
            # float rounding can report p one too high just below a
            # power of two once x nears 2^53 — exact int correction
            p = np.where((x >> np.minimum(p, 63)) == 0, p - 1, p)
            y = np.where(
                p >= f,
                x >> np.maximum(p - f, 0),
                x << np.maximum(f - p, 0),
            )
            r = np.zeros_like(x)
            two_f1 = np.int64(1) << np.int64(f + 1)
            for _ in range(q):
                y = (y * y) >> np.int64(f)
                hi = y >= two_f1
                r = (r << 1) + hi
                y = np.where(hi, y >> 1, y)
            return (p << np.int64(q)) + r

        def _ent_q(s: pd.Series) -> pd.Series:
            import numpy as np
            import pandas as pd

            mask = s.notna().to_numpy()
            vals = s[mask]
            out = np.zeros(len(s), dtype=np.int64)
            if len(vals):
                lens = vals.str.len().to_numpy(np.int64)
                arr = np.frombuffer(
                    "".join(vals.tolist()).encode("ascii"), dtype=np.uint8
                )
                n = len(vals)
                row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
                counts = np.bincount(
                    row_ids * 128 + arr, minlength=n * 128
                ).reshape(n, 128)
                rows, cols = np.nonzero(counts)
                c = counts[rows, cols].astype(np.int64)
                s_c = np.zeros(n, dtype=np.int64)
                np.add.at(s_c, rows, c * _ilog2_q_vec(c))
                out[mask] = lens * _ilog2_q_vec(lens) - s_c
            res = pd.Series(out)
            res[~mask] = None
            return res

        _ENT_Q_UDF = F.pandas_udf(_ent_q, "long")
    return _ENT_Q_UDF(s_col)


def char_entropy_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document character-distribution entropy — the classic
    gibberish/degeneracy signal (near-zero entropy = repeated chars;
    near-log2(alphabet) = uniform noise; natural text sits between).

    Exactness: H = log2 n − (1/n)·Σ c·log2 c needs logs, so the
    output is the EXACT integer numerator ``ent_q = n·ilog2_q(n) −
    Σ c·ilog2_q(c)`` (i.e. n·H in 2^-DSIR_Q log2 units — divide by
    n·2^DSIR_Q for bits/char) — the same square-and-compare integer
    log2 as DSIR (textops/selection.py::ilog2_q), so the DuckDB
    oracle replays every value bit-for-bit; no float logs.

    Scale shape (round 12): fully map-side — the per-row histogram
    replaces the old explode → (doc, ch) count → doc-keyed sum (two
    shuffles of per-CHARACTER rows; guide §2.3/§2.4). Docs whose
    normalized text is empty are dropped, exactly as the explode
    shape dropped them (no character rows → no group). ``n_chars`` is
    the normalized-text length (the histogram counts every character,
    spaces included). Round 13: the histogram+ilog2 runs in the
    vectorized Arrow/numpy column (:func:`char_entropy_q_col` — the
    interpreted HOF fold was the catalog's ta10 regression; still
    zero exchanges, still join-free).
    """
    nt = norm_text(text_col)
    staged = (
        df.select(F.col(id_col).alias("doc"), nt.alias("_s"))
        .filter(F.length("_s") > 0)
    )
    return staged.select(
        "doc",
        F.length("_s").cast("long").alias("n_chars"),
        char_entropy_q_col("_s").cast("long").alias("ent_q"),
    )


#: top-V vocabulary slice the Zipf slope is fitted over — fixed so
#: the fit is comparable across corpora (and so the frame the rank
#: window sees is bounded by construction).
ZIPF_TOP_V = 256

#: fixed-point fraction bits for the Zipf log-log regression. 14 (not
#: DSIR's 20) keeps the normal-equation products in BIGINT range in
#: the worst case: x = ilog2_q(rank) ≤ 8·2^14 < 2^18, y = ilog2_q(freq)
#: ≤ 63·2^14 < 2^20, so V·Σxy < 2^8·2^8·2^38 = 2^54 and
#: Σx·Σy < 2^26·2^28 = 2^54 — no overflow even at a 2^63-token corpus
#: (DSIR_Q=20 would overflow Σx·Σy past freq ≈ 2^40).
ZIPF_Q = 14


def zipf_slope(df, text_col: str = "text", top_v: int = ZIPF_TOP_V):
    """Zipf's-law slope of the corpus: least-squares fit of
    log2(freq) against log2(rank) over the ``top_v`` most frequent
    terms — natural language sits near −1; template/boilerplate
    corpora flatten toward 0 and degenerate ones fall off a cliff.
    The classic one-number corpus-health diagnostic to run next to
    the per-doc screens (Gopher rules, entropy, fluency).

    Exactness: both logs are the integer square-and-compare
    ``ilog2_q`` at q=:data:`ZIPF_Q` (see the overflow note there), so
    the normal-equation sums — and therefore ``slope_num`` /
    ``slope_den``, whose ratio IS the slope in cancelled 2^-q units —
    are exact BIGINTs the DuckDB oracle replays bit-for-bit. No float
    logs, no float division anywhere.

    Scale shape: one token explode + hash-agg shuffle builds the term
    histogram (map-side combine; vocabulary-sized, not corpus-sized);
    the top-V is a TakeOrderedAndProject (never a global sort), and
    the rank window runs AFTER the limit, on a ≤``top_v``-row frame
    that is already one partition — no exchange, one bounded task.
    The closing normal-equation aggregate is a global agg over ≤top_v
    rows (partial rows only through its exchange).

    Returns ONE row: (n_terms, sum_x, sum_y, slope_num, slope_den)
    with slope ≈ slope_num/slope_den (≈ −1 for healthy text).
    """
    from pyspark.sql import Window

    from .selection import ilog2_q_expr

    terms = df.select(F.explode(tokens(text_col)).alias("term"))
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    order = [F.col("freq").desc(), F.col("term")]
    top = counts.orderBy(*order).limit(top_v)
    pts = (
        top.withColumn("rk", F.row_number().over(Window.orderBy(*order)).cast("bigint"))
        .select(
            F.expr(ilog2_q_expr("rk", ZIPF_Q)).alias("x"),
            F.expr(ilog2_q_expr("freq", ZIPF_Q)).alias("y"),
        )
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
    )
    return sums.select(
        "n_terms",
        "sum_x",
        "sum_y",
        (F.col("n_terms") * F.col("_sxy") - F.col("sum_x") * F.col("sum_y"))
        .cast("long").alias("slope_num"),
        (F.col("n_terms") * F.col("_sxx") - F.col("sum_x") * F.col("sum_x"))
        .cast("long").alias("slope_den"),
    )


def ks_drift(df, group_col: str = "source", value_col: str = "n_chars"):
    """Two-sample Kolmogorov–Smirnov drift screen, one row per group:
    the KS distance between the group's ``value_col`` distribution
    and the REST of the corpus — the standard one-number monitor for
    "did this source/snapshot start shipping different-shaped
    documents" (run it on length, token count, quality score...).

    Exactness: D = max_x |F_a(x) − F_b(x)| evaluates only at jump
    points, so on integer values it is max over the merged value grid
    of |n_b·cumA − n_a·cumB| / (n_a·n_b) — all integers. The cross
    products reach N² (past BIGINT around 3·10^9 rows), so they are
    staged as DECIMAL(38,0) — exact to N ≈ 10^19 — and only the final
    basis-point ratio comes back to BIGINT.

    Scale shape: one (group, value) hash agg over the corpus, then
    everything runs on the bounded grid |groups| × |distinct values|
    (the ta10 argument: value domains like lengths are bounded, not
    corpus-sized). Per-group cumulatives are group-PARTITIONED
    windows; the all-corpus cumulative is the SUM of the per-group
    cumulatives at each grid point (a keyed agg) — never a
    partition-less window; group totals ride broadcasts.

    Returns (group, n_g, n_rest, v_at_max, ks_bp): ks_bp =
    floor(10000·D); v_at_max = the smallest value where D is attained
    (deterministic tie-break both engines replay).
    """
    from pyspark.sql import Window

    from ..cacheutil import persist_replannable

    dec = "decimal(38,0)"
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("v")
    )
    # counts is the bounded |groups|x|values| frame, but FOUR
    # consumers reference it (grid's two distincts, the fill join,
    # n_g) and AQE does not canonicalize the duplicated corpus
    # scan+agg subtrees (the td28 class — round-10 audit measured the
    # documents table scanned 6x here). Persisting the tiny frame
    # makes single-execution structural; replannable so the vanilla
    # gate session gets AQE-coalesced cached reads.
    counts = persist_replannable(
        "analysis.ks_drift",
        vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c")),
    )
    grid = (
        counts.select("v").distinct()
        .crossJoin(F.broadcast(counts.select("g").distinct()))
    )
    filled = grid.join(counts, ["g", "v"], "left").select(
        "g", "v", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    w = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = filled.withColumn("cum", F.sum("c").over(w))
    tot = cum.groupBy("v").agg(F.sum("cum").cast("long").alias("cum_all"))
    n_g = counts.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    n_all = n_g.agg(F.sum("n_g").cast("long").alias("n_all"))
    d = (
        cum.join(tot, "v")
        .join(F.broadcast(n_g), "g")
        .crossJoin(F.broadcast(n_all))
        .withColumn("n_rest", F.col("n_all") - F.col("n_g"))
        .withColumn(
            "_d",
            F.abs(
                F.col("n_rest").cast(dec) * F.col("cum")
                - F.col("n_g").cast(dec) * (F.col("cum_all") - F.col("cum"))
            ),
        )
    )
    best = d.groupBy("g", "n_g", "n_rest").agg(
        F.max(F.struct(F.col("_d").alias("d"), (-F.col("v")).alias("nv"))).alias("_m")
    )
    return best.select(
        F.col("g").alias(group_col),
        "n_g",
        "n_rest",
        (-F.col("_m.nv")).cast("long").alias("v_at_max"),
        F.expr(f"CAST((CAST(10000 AS {dec}) * _m.d) div "
               f"(CAST(n_g AS {dec}) * n_rest) AS BIGINT)").alias("ks_bp"),
    )


def source_overlap(
    df,
    group_col: str = "source",
    text_col: str = "text",
    hash_keys: bool = False,
):
    """Directed cross-source containment matrix — the data-card
    companion to per-doc dedup: for every ordered source pair (A, B)
    that shares at least one shingle, how much of A's distinct
    shingle set also appears in B (basis points). The standard
    corpus-composition diagnostic before mixing sources (a high
    containment_bp means source A is largely redundant given B).

    Exactness: set sizes and intersections are exact counts over
    DISTINCT (source, shingle) rows; containment_bp =
    (10000·|A∩B|) div |A| in pure BIGINT.

    Scale shape: one distinct (source, shingle) agg over the corpus,
    then a shingle-keyed self-join whose per-key fan-out is bounded
    by the number of SOURCES (not documents) — output ≤ |S|² rows.
    ``hash_keys=True`` is the 100 TB path (8-byte xxhash64 shingle
    keys through the shuffle, the td2h discipline); gate builds keep
    raw strings so DuckDB replays bit-for-bit.
    """
    toks = df.select(F.col(group_col).alias("g"), tokens(text_col).alias("t"))
    ss = toks.select("g", F.explode(shingles("t")).alias("s"))
    if hash_keys:
        ss = ss.select("g", F.xxhash64("s").alias("s"))
    ss = ss.distinct()
    tot = ss.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a, b = ss.alias("a"), ss.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.g") != F.col("b.g"))
        .groupBy(F.col("a.g").alias("src_a"), F.col("b.g").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return inter.join(
        F.broadcast(tot.withColumnRenamed("g", "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        "n_common",
        F.col("n_sh").alias("n_sh_a"),
        F.expr("CAST((10000 * n_common) div n_sh AS BIGINT)").alias("containment_bp"),
    )
