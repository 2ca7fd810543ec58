"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting, shingling
and portable hashing (foundation for the dedup layer).

Everything is built-in-function SQL — no Python UDFs — so the whole
layer runs inside whole-stage codegen and scales linearly with input
splits at 100 TB. The hash primitive is engine-portable (md5-derived),
which is what lets the DuckDB oracle verify minhash/simhash exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword sets for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu"),
}


def portable_hash64(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB:
    first 15 hex digits of md5, parsed as an integer. (xxhash64 etc.
    are engine-specific; md5 is the portable common denominator. At
    100 TB scale md5 costs ~2× xxhash64 — swap via this single choke
    point if oracle parity is not needed.)"""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


#: value span of portable_hash64: 15 hex digits → [0, 16^15)
HASH64_SPAN = 16**15


def tagged_hash64(tag: str, *keys: Column) -> Column:
    """THE keyed-hash convention: portable_hash64 of the tag and key
    columns joined by the ``\\x1f`` unit separator. Every deterministic
    membership/order operator (`ml.hash_split`,
    `sampling.hash_uniform`) and its DuckDB oracle mirror reproduce
    exactly this byte layout — change it ONLY here (and in the oracle
    generators) or splits/samples silently desynchronize."""
    return portable_hash64(F.concat_ws("\x1f", F.lit(tag), *keys))


def tokens(text: Column, sep: str = " ") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(text, sep)


def regex_token_count(text: Column, pattern: str = r"\w+|[^\w\s]") -> Column:
    """BPE-ish token counting: words plus standalone punctuation."""
    return F.regexp_count(text, F.lit(pattern))


def word_shingles(words: Column, n: int = 3) -> Column:
    """n-word shingles as strings, built as zip_with over n shifted
    slices of the words array — strictly O(len) per row.

    Why not transform(sequence(...), i -> element_at(words, i+j))?
    Catalyst inlines the words expression (e.g. split(text)) into each
    element_at when projections collapse, and `InferFiltersFromGenerate`
    copies the whole shingle expression into a pre-explode Filter —
    turning an indexed formulation into O(len²) evaluated twice
    (measured 7.1s vs 0.2s on sf0.1 documents). Slices evaluate the
    words expression once each, so worst-case inlining stays linear.
    Empty array when the doc has < n words."""
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    out = F.slice(words, 1, m)
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(words, j + 1, m),
            lambda acc, nxt: F.concat_ws(" ", acc, nxt),
        )
    return out


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprint/dedup: lowercase, strip
    non-alphanumerics, collapse runs of spaces."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (hex), plus use
    `portable_hash64(fingerprint_ish)` when a numeric key is needed."""
    return F.md5(normalize_text(text).cast("binary"))


#: winnowing domain (fits comfortably in int64 window minima); prime
#: (2³¹−1), so the polynomial rolling hash below is over a field
WINNOW_M = 2_147_483_647

#: rolling-hash base: big enough to spread char codes, small enough
#: that (h < M) · B + code never leaves int64 (ANSI mode would raise)
WINNOW_B = 1_000_003


def winnow_fingerprints(
    df, text_col: str, id_col: str, k: int = 8, w: int = 4
):
    """Winnowing (the MOSS fingerprint selection): hash every char
    k-gram, take the minimum hash of each w-length window, dedupe.
    Any shared substring of length ≥ w+k−1 between two documents
    shares a fingerprint; each doc keeps ~len/w fingerprints.

    Shape (round-6 rewrite, VERDICT r05 item 6): posexplode the CHARS,
    then compute the k-gram polynomial hash
    h(c_i…c_{i+k−1}) = Σⱼ code(c_{i+j})·B^(k−1−j) mod M
    with k−1 `lead()`s folded Horner-style — all on the one window
    (doc, pos-ordered) the min-frame pass needs anyway. Both window
    passes share a single exchange + sort, every expression is plain
    int64 arithmetic in JVM projections, and no per-gram string is
    ever materialized.

    Measured at sf0.1 (same 550 227 output rows):
    - r05 shipped: build k-char strings by zip_with doubling, md5 each
      → 8.8 s;
    - array-domain rolling hash (zip_with doubling over int hashes —
      VERDICT's literal suggestion): 7.1 s — dropping md5 helps less
      than expected because interpreted zip_with lambdas dominate;
    - this window/lead formulation: **1.1 s warm**. The earlier 40×
      array-vs-explode result generalizes: escaping interpreted
      higher-order lambdas beats minimizing bytes hashed.

    Trade-off vs md5: 31-bit polynomial fingerprints collide more
    often, but winnowing's contract (shared substring ⇒ shared
    fingerprint) needs collisions RARE, not cryptographic; both
    engines compute identical values (DuckDB: nested Horner in
    suite/text.py _KGRAMS), so parity stays bit-exact.

    One shuffle total: the final dedupe groups by the window's own
    partition key, reusing its exchange. Per-doc state is ~len/w
    fingerprints; for adversarial multi-GB single documents swap the
    last two lines back to `.select(id_col, "fp").distinct()`.
    Returns (id_col, fp) rows."""
    from pyspark.sql import Window

    chars = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "")).alias("pos", "c"),
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    code = F.ascii("c").cast("bigint")
    h = code
    for j in range(1, k):
        h = (h * WINNOW_B + F.lead(code, j).over(win)) % WINNOW_M
    # trailing positions (fewer than k chars left) have a NULL lead →
    # NULL hash; dropping them leaves exactly len−k+1 gram hashes
    hashed = chars.select(
        F.col(id_col), "pos", h.alias("h")
    ).filter(F.col("h").isNotNull())
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    windowed = hashed.select(
        F.col(id_col),
        F.min("h").over(frame).alias("fp"),
        F.count("h").over(frame).alias("__n"),
    )
    return (
        windowed.filter(F.col("__n") == w)
        .groupBy(id_col)
        .agg(F.collect_set("fp").alias("__fps"))
        .select(F.col(id_col), F.explode("__fps").alias("fp"))
    )


def stopword_hits(words: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def lang_scores(words: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (language-ID heuristic)."""
    return {lang: stopword_hits(words, sw) for lang, sw in LANG_STOPWORDS.items()}


def predict_lang(words: Column) -> Column:
    """Argmax over language scores with a fixed preference order
    (en > es > de on ties) — deterministic."""
    s = lang_scores(words)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]), "en")
        .when(s["es"] >= s["de"], "es")
        .otherwise("de")
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    w = tokens(text)
    n_tok = F.size(w)
    char_len = F.length(text)
    total_word_chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x
    )
    punct = F.regexp_count(text, F.lit(r"[.,!?;:]"))
    stop = stopword_hits(w, LANG_STOPWORDS["en"])
    return {
        "n_tokens": n_tok,
        "char_len": char_len,
        "avg_word_len": total_word_chars.cast("double") / n_tok,
        "punct_ratio": punct.cast("double") / char_len,
        "stopword_ratio": stop.cast("double") / n_tok,
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher App. A family —
    Rae et al. 2021 filter on duplicate-line and repeated-n-gram
    fractions; these docs are single-line, so the word-level pair):

    - ``dup_word_frac``: fraction of tokens that are repeats of an
      earlier token, ``1 − distinct/total``.
    - ``top_bigram_frac``: fraction of all word bigrams taken by the
      most frequent one (high ⇒ loops/boilerplate).

    Both are per-row array expressions: no shuffle, no UDF, scales as
    a map. The bigram mode is the longest equal run in the SORTED gram
    array — one O(k log k) native sort plus one O(k) aggregate pass.
    (The obvious `transform(distinct, g -> count in grams)` nesting is
    O(k²) in interpreted lambda dispatches and measured 9× slower on
    the whole q60 pass — same lesson as winnowing's array-native
    negative result: keep interpreted lambda work linear.)

    Empty tokens from irregular whitespace are dropped first — 'a  b'
    must not count a phantom repeat ('' twice) nor feed 'a '/' b'
    bigrams (same filter as pack_documents)."""
    w = F.filter(tokens(text), lambda x: x != F.lit(""))
    n = F.size(w)
    # guard n = 0: 0/0 would make the fraction NULL, and a downstream
    # `dup_word_frac < x` threshold would silently drop empty docs as
    # "dirty-unknown" — an empty doc has zero repetition, so 0.0
    dup = F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n,
    ).otherwise(F.lit(0.0))
    grams = word_shingles(w, 2)
    ng = F.size(grams)
    top = F.aggregate(
        F.sort_array(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.when(ng > 0, top.cast("double") / ng).otherwise(F.lit(0.0))
    return {"dup_word_frac": dup, "top_bigram_frac": top_frac}


#: Gopher rule 7's required English words (Rae et al. 2021 App. A:
#: "contains at least 2 of the following")
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """The Gopher document-quality rule set (Rae et al. 2021,
    Appendix A) as SEVEN boolean columns plus an integer bitmask and
    the conjunction ``keep`` — the published heuristic gate most LLM
    pipelines run before any model-based filter (`quality_clf`,
    `ngram_lm`, `dsir` here).

    Rules (bit i set = rule i passed):
      0. word count in [min_words, max_words]
      1. mean word length in [3, 10] chars
      2. symbol-to-word ratio ('#' or '...') ≤ 0.1
      3. ≤ 90% of lines start with a bullet ('-', '*', '•')
      4. ≤ 30% of lines end with an ellipsis
      5. ≥ 80% of words contain ≥ 1 alphabetic character
      6. ≥ 2 distinct words from GOPHER_REQUIRED_WORDS

    Every ratio threshold is evaluated by INTEGER cross-multiplication
    (3·n ≤ chars ≤ 10·n, 10·sym ≤ n, …) — no float division, so the
    verdicts are bit-exact across engines and partitionings, the
    `quality_clf` scaled-integer discipline. One codegen pass over the
    row: no explode, no shuffle, no Python — linear at 100 TB."""
    w = F.filter(tokens(text), lambda x: x != F.lit(""))
    n = F.size(w)
    chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n_sym = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]"))
    )
    n_ell_end = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"\.\.\.$"))
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_req = sum(
        (
            F.when(F.array_contains(w, F.lit(s)), 1).otherwise(0)
            for s in GOPHER_REQUIRED_WORDS
        ),
        F.lit(0),
    )
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_word_len": (3 * n <= chars) & (chars <= 10 * n),
        "r_symbol": 10 * n_sym <= n,
        "r_bullet": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis": 10 * n_ell_end <= 3 * n_lines,
        "r_alpha": 5 * n_alpha >= 4 * n,
        "r_stopwords": n_req >= 2,
    }
    mask = sum(
        (
            F.when(r, F.lit(1 << i)).otherwise(0)
            for i, r in enumerate(rules.values())
        ),
        F.lit(0),
    ).cast("bigint")
    keep = rules["r_word_count"]
    for r in list(rules.values())[1:]:
        keep = keep & r
    return {**rules, "gopher_mask": mask, "gopher_keep": keep}


def chunk_documents(
    df,
    text_col: str,
    id_col: str,
    size: int,
    overlap: int = 0,
):
    """Split documents into fixed token windows with overlap — the
    chunker feeding context-window-bounded training samples and RAG
    indexes. Emits (id, chunk_id, chunk_text, n_tokens): windows start
    every `size − overlap` tokens; the final window may be short but a
    trailing remainder is never dropped; docs at or under `size`
    yield exactly one chunk.

    Pure codegen: `sequence` generates the starts, `slice`+`concat_ws`
    cut each window — an explode whose fan-out is ~len/(size−overlap)
    per doc, embarrassingly parallel, no shuffle. Empty tokens from
    irregular whitespace are dropped first, so window boundaries are
    word-accurate."""
    if not 0 <= overlap < size:
        raise ValueError("chunk_documents: need 0 <= overlap < size")
    stride = size - overlap
    words = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    n = F.size(words)
    # last start s must satisfy s <= n - overlap (else the window is a
    # pure suffix of the previous one); always at least one start
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "__start"),
        words.alias("__words"),
    )
    piece = F.slice(F.col("__words"), F.col("__start"), size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        # empty/whitespace-only/NULL docs otherwise emit one phantom
        # ('' , 0-token) chunk from the always-≥1 starts sequence;
        # a NULL n_tokens (NULL text) fails the predicate too
    ).filter(F.col("n_tokens") > 0)


def bm25(
    df,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "bm25",
):
    """Okapi BM25 relevance of every document against a fixed term set
    (Robertson/Zaragoza, with the Lucene +1 IDF so scores stay ≥ 0) —
    the ranking/quality-scoring primitive a corpus pipeline uses for
    query-targeted filtering. Appends `out_col`; all other columns pass
    through.

    Spark-first shape: per-term tf and the document length are codegen
    array expressions; the corpus statistics (N, avg doc length, df_t)
    are ONE single-row global aggregate (map-side partial, no shuffle
    of documents) broadcast back via crossJoin. Two linear scans of
    the corpus, zero document-side shuffles — at 100 TB the stats row
    is bytes, and scoring is a map. Per-term df uses exact integer
    counts and avgdl an exact decimal sum, so the only cross-engine
    freedom is ln/division — handled by rounding at the query edge."""
    toks = tokens(F.col(text_col))
    dl = F.size(toks)

    def tf(t: str) -> Column:
        return F.size(F.filter(toks, lambda w: w == F.lit(t)))

    stats = df.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(dl.cast("decimal(25,6)")).cast("double").alias("__sum_dl"),
        *[
            F.sum((tf(t) > 0).cast("bigint")).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    joined = df.crossJoin(F.broadcast(stats))
    n = F.col("__n_docs").cast("double")
    avgdl = F.col("__sum_dl") / n
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dft = F.col(f"__df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dft + 0.5) / (dft + 0.5))
        tft = tf(t).cast("double")
        score = score + idf * (
            tft * (k1 + 1.0) / (tft + k1 * (1.0 - b + b * dl / avgdl))
        )
    drop = ["__n_docs", "__sum_dl"] + [f"__df_{i}" for i in range(len(terms))]
    return joined.withColumn(out_col, score).drop(*drop)


#: PII patterns (redaction pass for corpus publication): emails, E.164
#: and US-formatted phone numbers, IPv4 addresses, 13-19-digit card
#: numbers (optionally space/dash-grouped, any grouping — covers
#: 4-4-4-4, Amex 4-6-5, 13-digit Visa, 19-digit UnionPay). A scrubber
#: trades precision for recall: 13+-digit non-card numbers redact too.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": (
        r"(?:\+\d{1,3}[ -]?)?(?:\(\d{3}\)[ -]?|\b\d{3}[ -])\d{3}[ -]\d{4}\b"
        r"|\+\d{7,15}\b"
    ),
    "IP": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "CARD": r"\b\d(?:[ -]?\d){12,18}\b",
}


def redact_pii(text: Column) -> Column:
    """Replace PII spans with typed placeholders (``[EMAIL]`` …) — the
    standard pre-release scrub pass for a training corpus. Pure
    `regexp_replace` chain: whole-stage codegen, scales linearly, no
    UDFs. Order matters: emails first (their digits must not be eaten
    by the phone/card patterns), cards before phones (a 16-digit card
    with dashes contains phone-shaped substrings)."""
    out = text
    for name in ("EMAIL", "CARD", "PHONE", "IP"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"[{name}]")
    return out


#: C4's line-drop phrase list (Raffel et al. 2020 §2.2, the published
#: heuristics): lines mentioning javascript/cookies/policy boilerplate
#: are navigation chrome, not prose. Matched case-insensitively.
C4_LINE_PHRASES: tuple[str, ...] = (
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
)

#: page-level kill phrases: template filler and source-code pages
C4_DOC_PHRASES: tuple[str, ...] = ("lorem ipsum",)


def c4_clean_lines(
    df,
    text_col: str,
    id_col: str,
    line_sep: str = "\n",
    min_words: int = 5,
    min_lines: int = 3,
):
    """The C4 line-level cleaning pass (Raffel et al. 2020 §2.2) —
    the published web-cleaning recipe the reference's row-level
    `distinct` passes scale up to for training data:

    - keep only lines that END in terminal punctuation (. ! ? ");
    - keep only lines with ≥ `min_words` whitespace words;
    - drop lines containing any `C4_LINE_PHRASES` entry
      (case-insensitive) — navigation/cookie chrome;
    - drop the whole page if it contains a curly brace (source code)
      or any `C4_DOC_PHRASES` entry, or if fewer than `min_lines`
      lines survive.

    Returns the input rows (metadata columns pass through) with
    `text_col` rebuilt from the surviving lines in order plus an
    appended `n_kept`; dropped pages emit NO row (the paragraph_dedup
    convention — left-join back to see the drops).

    Spark shape: one codegen map per page — split, one array filter
    with JVM lambda predicates, array_join. No explode, no shuffle,
    no Python; at 100 TB this is a free rider on whatever scan feeds
    it (the same posture as `quality_features`). C4's fourth rule —
    corpus-wide three-sentence dedup — is `paragraph_dedup` composed
    after this pass, not re-implemented here."""
    lines = F.split(F.col(text_col), "\\Q" + line_sep + "\\E")

    def keep(line: Column) -> Column:
        words = F.size(
            F.filter(F.split(line, " "), lambda w: w != F.lit(""))
        )
        cond = line.rlike('[.!?"]$') & (words >= F.lit(min_words))
        low = F.lower(line)
        for ph in C4_LINE_PHRASES:
            cond &= F.instr(low, ph) == 0
        return cond

    kept = F.filter(lines, keep)
    doc_ok = F.instr(F.col(text_col), "{") == 0
    for ph in C4_DOC_PHRASES:
        doc_ok &= F.instr(F.lower(F.col(text_col)), ph) == 0
    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.withColumn("__kept", kept)
        .filter(doc_ok & (F.size("__kept") >= min_lines))
        .select(
            *passthrough,
            F.array_join("__kept", line_sep).alias(text_col),
            F.size("__kept").cast("bigint").alias("n_kept"),
        )
    )


def pack_documents(
    df,
    text_col: str,
    id_col: str,
    capacity: int,
    shard_col=None,
    allow_global: bool = False,
):
    """Contiguous sequence packing: assign documents (ordered by
    `id_col`) to bins whose total whitespace-token count stays ≤
    `capacity` — the greedy next-fit packing LLM training uses to
    batch variable-length documents into fixed token budgets. A doc
    longer than `capacity` gets a bin of its own. Returns
    (shard?, id, n_tokens, bin) with bins numbered per shard.

    Packing is inherently sequential in the chosen order, so it runs
    as ONE Arrow-batched pass per shard (`applyInPandas`) after the
    token counts are computed JVM-side — the same pattern as the
    connected-components single-task fast path. `shard_col=None`
    packs globally (ONE task holds every row — only for corpora that
    fit one task) and therefore requires `allow_global=True`; at
    100 TB pass a shard column (source/date/hash-bucket) — bins then
    never cross shard boundaries, which training pipelines want
    anyway, and shards pack in parallel."""
    import pandas as pd

    if shard_col is None and not allow_global:
        raise ValueError(
            "pack_documents: shard_col=None serializes the ENTIRE "
            "corpus through one task — pass a shard column (source/"
            "date/hash-bucket) for distributed packing, or opt in "
            "explicitly with allow_global=True for small inputs"
        )
    if shard_col is None:
        shard_name, shard_expr = "__shard", F.lit(0).alias("__shard")
        shard_type = "int"
    else:
        shard_name, shard_expr = shard_col, F.col(shard_col)
        shard_type = df.schema[shard_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    # count non-empty tokens only (split() yields '' for leading/
    # trailing/double whitespace; an empty doc is 0 tokens, not 1)
    real_tokens = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    base = df.select(
        shard_expr,
        F.col(id_col),
        F.size(real_tokens).cast("long").alias("n_tokens"),
    )
    out_schema = (
        f"{shard_name} {shard_type}, {id_col} {id_type}, "
        "n_tokens long, bin long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, b, filled = [], 0, 0
        for n in pdf["n_tokens"]:
            if filled > 0 and filled + n > capacity:
                b, filled = b + 1, 0
            bins.append(b)
            filled += n
        pdf["bin"] = bins
        return pdf

    return base.groupBy(shard_name).applyInPandas(pack, out_schema)


def bm25_topk(
    df,
    text_col: str,
    id_col: str,
    queries: dict[int, list[str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Multi-query BM25 retrieval: top-k documents per query — the
    lexical-search sibling of `similarity.brute_force_topk` (and the
    retrieval half of a RAG data pipeline; `bm25` above scores one
    fixed term set as a column, this ranks a query WORKLOAD).

    Spark-first inverted shape (one corpus scan, no per-query rescans):
    1. each document explodes to (doc, term, tf) rows for the UNION of
       all query terms only, filtered map-side to tf > 0 — the
       scan-side inverted index;
    2. corpus stats (N, Σdl) are one single-row aggregate; per-term df
       is an exact count over the term-cardinality matched table —
       both broadcast;
    3. the (q_id, term) workload table broadcasts onto the matched
       rows; per-term contributions use the same Robertson/Zaragoza
       +1-IDF expression as `bm25`;
    4. per (q_id, doc) the contributions fold in TERM-SORTED order
       (float addition is not associative; the sorted fold is
       bit-deterministic across partitionings and engines — the
       `sampling.temperature_domain_sample` discipline);
    5. scores round to 6 decimals BEFORE ranking (ln may differ in the
       last ulp across engines; ranking on the rounded value with a
       doc-id tie-break keeps the top-k list engine-deterministic),
       then one row_number window per query keeps k.

    Shuffle bill: 1 tiny df aggregate, 1 (q,doc) aggregate, 1 window
    on q — the corpus itself never shuffles; only matched (doc, term,
    tf) rows move. Returns (q_id, `id_col`, score, rank).
    """
    all_terms = sorted({t for ts in queries.values() for t in ts})
    if not all_terms:
        raise ValueError("queries carry no terms")
    toks = tokens(F.col(text_col))
    dl = F.size(toks)

    term_arr = F.array(*[F.lit(t) for t in all_terms])
    entries = F.filter(
        F.transform(
            term_arr,
            lambda t: F.struct(
                t.alias("term"),
                F.size(F.filter(toks, lambda w: w == t)).alias("tf"),
            ),
        ),
        lambda s: s["tf"] > 0,
    )
    matched = df.select(
        F.col(id_col),
        dl.alias("__dl"),
        F.explode(entries).alias("__e"),
    ).select(
        id_col, "__dl", F.col("__e.term").alias("term"),
        F.col("__e.tf").alias("tf"),
    )

    stats = df.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(dl.cast("decimal(25,6)")).cast("double").alias("__sum_dl"),
    )
    dft = matched.groupBy("term").agg(F.count("*").alias("__df"))

    spark = df.sparkSession
    qrows = [(int(q), t) for q, ts in queries.items() for t in ts]
    # bounded partitions: the query table is workload-sized (tens of
    # terms), and the default 32-slice parallelize pays ~empty tasks
    # on every BM25 call (the round-14 literal_df finding); it is
    # broadcast into the join either way
    from ..sources.io import literal_df

    qtable = literal_df(spark, qrows, "q_id bigint, term string")

    n = F.col("__n_docs").cast("double")
    avgdl = F.col("__sum_dl") / n
    dfd = F.col("__df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfd + 0.5) / (dfd + 0.5))
    tfd = F.col("tf").cast("double")
    contrib = idf * (
        tfd * (k1 + 1.0)
        / (tfd + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl))
    )

    scored = (
        matched.join(F.broadcast(qtable), "term")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select("q_id", id_col, F.col("term"), contrib.alias("__c"))
        .groupBy("q_id", id_col)
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("term", "__c"))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["__c"],
                ),
                6,
            ).alias("score")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "score", "rank")
    )
