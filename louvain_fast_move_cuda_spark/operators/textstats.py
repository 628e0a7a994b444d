"""Text-analysis operators for training-data pipelines over `documents`.

Language ID (character n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprints —
all built-in pyspark.sql.functions column expressions (whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]

# tiny per-language marker vocabularies for the n-gram heuristic
_LANG_MARKERS = {
    "en": ["the ", " and ", " of ", " to ", "ing "],
    "de": [" der ", " und ", " die ", " ist ", "sch"],
    "fr": [" le ", " et ", " les ", " des ", " une "],
    "es": [" el ", " de ", " que ", " los ", " una "],
}


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_bpe_tokens) — two tokenizers:
    whitespace and a BPE-ish regex (word pieces / numbers / punctuation)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    # BPE-ish pre-tokenizer: alnum runs and single non-alnum-nonspace marks.
    # RE2-compatible (no lookarounds) so the DuckDB oracle can mirror it.
    bpe = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)))
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, len_score, punct_ratio, stopword_ratio, alpha_ratio, quality).

    Composite heuristic quality in [0,1]: length band, punctuation share,
    stopword density, alphabetic share — the standard cheap pre-filters of
    large-scale corpus pipelines.
    """
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1)).cast("double")
    punct = (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double") / n
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double") / n
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_words = F.greatest(F.size(words), F.lit(1)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stops = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x))).cast("double") / n_words
    len_score = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    quality = (
        len_score * 0.25
        + (F.lit(1.0) - F.least(punct * 4.0, F.lit(1.0))) * 0.25
        + F.least(stops * 5.0, F.lit(1.0)) * 0.25
        + alpha * 0.25
    )
    return docs.select(
        F.col(id_col),
        len_score.alias("len_score"),
        punct.alias("punct_ratio"),
        stops.alias("stopword_ratio"),
        alpha.alias("alpha_ratio"),
        quality.alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax of marker n-gram hit counts."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        s = None
        for mk in markers:
            # occurrence count of marker mk
            cnt = (F.length(t) - F.length(F.replace(t, F.lit(mk), F.lit("")))) / len(mk)
            s = cnt if s is None else s + cnt
        scores.append(F.struct(s.cast("double").alias("score"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return docs.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def word_hashes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, hs: array<long>) — position-ordered per-word hash codes,
    each pmod-reduced into the Mersenne modulus 2^31−1.

    The fingerprint input table, exposed separately so the
    (engine-specific) xxhash64 primitive can be materialized and the
    rolling-fold semantics oracle-checked in ANSI SQL downstream.
    """
    mod = F.lit((1 << 31) - 1).cast("long")
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != "")
    return docs.select(
        F.col(id_col),
        F.transform(words, lambda w: F.pmod(F.xxhash64(w), mod)).alias("hs"),
    )


def fingerprint_from_hashes(wh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp: long) — polynomial rolling fold over (doc_id, hs).

    acc := (acc*31 + h) mod (2^31−1); the Mersenne modulus keeps
    acc*31+term inside a signed long under ANSI arithmetic. Order
    matters (unlike a set hash); the fold itself is plain modular
    arithmetic, expressible identically in any ANSI SQL engine.
    """
    mod = F.lit((1 << 31) - 1).cast("long")
    rolled = F.aggregate(
        F.col("hs"),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(31).cast("long") + x, mod),
    )
    return wh.select(F.col(id_col), rolled.alias("fp"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp: long) — order-sensitive rolling document fingerprint.

    Equal normalized texts produce equal fingerprints; word order matters.
    """
    return fingerprint_from_hashes(word_hashes(docs, text_col, id_col), id_col)


def corpus_terms(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) — one row per token occurrence, using the same
    BPE-ish pre-tokenizer as token_stats (RE2-compatible, so the DuckDB
    oracle mirrors it verbatim). The shared input of the corpus-level
    statistics below."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    return docs.select(F.col(id_col), F.explode(toks).alias("term"))


def top_terms(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf, df, tfidf_r9, term_rank) — per-document
    keyword extraction: the top-``k`` terms ranked by the EXACT integer
    triple (tf DESC, df ASC, term ASC) — highest in-document count,
    rarest across the corpus, lexicographic tie-break. The ranking
    deliberately avoids ordering by the float tf·idf score (1-ulp libm
    divergence across engines could flip a near-tie and change which
    terms are selected); smoothed tf·idf = tf · (ln((N+1)/(df+1)) + 1)
    is still emitted, r9-rounded, as the informative score. The integer
    ranking agrees with tf·idf whenever one term dominates the other in
    (tf, -df); it differs only on mixed trade-offs, where it is the
    better-defined contract.

    Scale: one explode + two groupBys + one term-keyed join (the df
    table is vocabulary-sized) + one per-doc window bounded by the
    document's distinct terms.
    """
    terms = corpus_terms(docs, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df").cast("double") + F.lit(1.0))) + F.lit(1.0)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf").cast("double") * idf, 9).alias("tfidf_r9"),
            "term_rank",
        )
    )


def rarity_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_terms, rarity_r9) — mean negative log corpus
    frequency of the document's tokens (the cheap stand-in for CCNet's
    LM-perplexity corpus filter): rarity = (1/n) Σ_tok −ln(c_tok / C),
    where c_tok = corpus occurrences of the token and C = total corpus
    tokens. To keep the result independent of partition/summation
    order (a raw float avg drifts with shuffle order), each token's nll
    is rounded to integer micro-nats first (one per-token double
    expression, bit-identical across engines), the per-doc sum is then
    an EXACT integer aggregate, and a single final divide produces the
    r9 score. High = unusual vocabulary; low = boilerplate. Empty docs
    get 0.0.

    Scale: explode + vocabulary-sized frequency table + one term-keyed
    join + per-doc integer sum — no per-pair work anywhere.
    """
    terms = corpus_terms(docs, text_col, id_col)
    freq = terms.groupBy("term").agg(F.count("*").alias("c_tok"))
    total = terms.count()
    nll_micro = F.round(
        -F.log(F.col("c_tok").cast("double") / F.lit(float(total))) * F.lit(1000000.0),
        0,
    ).cast("long")
    scored = (
        terms.join(freq, "term")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_terms"), F.sum(nll_micro).alias("micro_sum"))
        .select(
            id_col,
            "n_terms",
            F.round(
                F.col("micro_sum").cast("double")
                / (F.col("n_terms").cast("double") * F.lit(1000000.0)),
                9,
            ).alias("rarity_r9"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
            F.coalesce("rarity_r9", F.lit(0.0)).alias("rarity_r9"),
        )
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_grams2, n_dup_pos2, rep2_r9, n_grams3, n_dup_pos3,
    rep3_r9) — within-document repetition profile (the Gopher /
    MassiveText repetition filters, token-level): for n in {2, 3}, the
    fraction of n-gram positions whose n-gram occurs more than once in
    the SAME document. Boilerplate and degenerate generations score
    high; all counts are integers and each fraction is one r9 divide,
    so the check is exact.

    Scale: tokenization + two self-contained aggregations per n — a
    per-(doc, gram) count then a per-doc sum, shuffling only on doc_id
    (the gram never leaves its document, unlike curation.dup_spans).
    """
    from .curation import doc_ngrams

    out = docs.select(id_col)
    for n in (2, 3):
        grams = doc_ngrams(docs, n, text_col, id_col)
        per = (
            grams.groupBy(id_col, "gram")
            .agg(F.count("*").alias("c"))
            .groupBy(id_col)
            .agg(
                F.sum("c").alias(f"n_grams{n}"),
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                    f"n_dup_pos{n}"
                ),
            )
        )
        out = out.join(per, id_col, "left")
    cols = [F.col(id_col)]
    for n in (2, 3):
        ng = F.coalesce(f"n_grams{n}", F.lit(0))
        nd = F.coalesce(f"n_dup_pos{n}", F.lit(0))
        cols += [
            ng.alias(f"n_grams{n}"),
            nd.alias(f"n_dup_pos{n}"),
            F.round(
                nd.cast("double") / F.greatest(ng, F.lit(1)).cast("double"), 9
            ).alias(f"rep{n}_r9"),
        ]
    return out.select(*cols)


def vocab_coverage(
    docs: DataFrame, top_v: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, cnt, term_rank, cum_cnt, coverage_r9) — the top-``top_v``
    corpus vocabulary by occurrence count (ties broken lexicographically)
    with each prefix's cumulative share of all corpus tokens: the
    tokenizer-budget curve ("how much of the corpus do V types cover").
    cum_cnt is an exact integer running sum; coverage is one r9 divide
    per row.

    Scale: the global top-V runs as a distributed
    TakeOrderedAndProject (never a full sort); only the V surviving
    rows pass through the single-partition ranking window, so the
    window input is bounded by ``top_v`` regardless of corpus size.
    """
    terms = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
            )
        ).alias("term")
    )
    total = terms.count()
    top = (
        terms.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_v)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return (
        top.withColumn("term_rank", F.row_number().over(w))
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select(
            "term",
            "cnt",
            "term_rank",
            "cum_cnt",
            F.round(
                F.col("cum_cnt").cast("double") / F.lit(float(total)), 9
            ).alias("coverage_r9"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bigrams, nll_r9) — mean add-one-smoothed bigram
    negative log-likelihood of each doc under a language model trained
    on the corpus itself: nll = -ln((c(w1,w2)+1) / (c(w1·)+V)) averaged
    over the doc's bigram positions (V = corpus vocabulary size,
    c(w1·) = occurrences of w1 as a bigram history). The classic
    cheap fluency / perplexity proxy — word salad and shuffled text
    score high, natural repeated phrasing scores low; exp(nll_r9) is
    the per-doc perplexity.

    Determinism follows rarity_scores: each position's nll is rounded
    to integer micro-nats (one double expression, bit-identical across
    engines), the per-doc sum is an exact integer aggregate, and one
    final divide yields the r9 mean — no float accumulation order
    anywhere.

    Scale: one bigram explode (linear in corpus tokens), two
    aggregations to build the model tables, two bigram-keyed joins to
    score, one per-doc integer sum. The model tables are corpus-level
    but vocabulary-sized; everything shuffles on token keys with
    map-side partial aggregation — no per-pair or per-doc^2 work.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    base = docs.select(F.col(id_col), toks.alias("ts"))
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(0), F.size("ts") - 2)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("ts", i + 1).alias("w1"),
            F.element_at("ts", i + 2).alias("w2"),
        ),
    )
    big = base.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    vocab = int(
        docs.select(F.explode(toks).alias("t")).agg(
            F.countDistinct("t").alias("v")
        ).collect()[0]["v"]
    )
    cb = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    cu = big.groupBy("w1").agg(F.count("*").alias("cu"))
    nll_micro = F.round(
        -F.log(
            (F.col("cb") + F.lit(1)).cast("double")
            / (F.col("cu") + F.lit(vocab)).cast("double")
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    scored = (
        big.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum(nll_micro).alias("micro_sum"))
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("micro_sum").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(1000000.0)),
                9,
            ).alias("nll_r9"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll_r9", F.lit(0.0)).alias("nll_r9"),
        )
    )


def length_quantiles(
    docs: DataFrame,
    quantiles: tuple = (25, 50, 75, 90, 99),
    text_col: str = "text",
) -> DataFrame:
    """(q, n_docs, value) — EXACT length quantiles of the BPE-ish token
    count distribution: for each q, the smallest length whose cumulative
    doc count reaches ceil(q/100 * N) (i.e. the lower / type-1 discrete
    quantile). Exact, not approximate — percentile_approx's sketch
    error is engine-specific and would never oracle-match.

    Plan: per-doc length (no shuffle), one groupBy on the length VALUE
    (bounded distinct key space — lengths, not docs), then a running
    sum over the distinct lengths. The single-partition window is safe
    for the same reason vocab_coverage's is: its input is one row per
    DISTINCT length, thousands at most, regardless of corpus size.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    lens = docs.select(F.size(toks).cast("long").alias("value"))
    n = lens.count()
    counts = lens.groupBy("value").agg(F.count("*").alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("value", F.sum("c").over(w).alias("cum"))
    qdf = cum.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles], "q int"
    ).withColumn(
        # ceil(q*N/100) in pure integer arithmetic
        "target",
        F.floor(
            (F.col("q").cast("long") * F.lit(int(n)).cast("long") + F.lit(99))
            / F.lit(100)
        ).cast("long"),
    )
    return (
        qdf.join(cum, F.col("cum") >= F.col("target"))
        .groupBy("q", "target")
        .agg(F.min("value").alias("value"))
        .select("q", F.lit(n).cast("long").alias("n_docs"), "value")
    )


def length_gini_by_source(docs: DataFrame) -> DataFrame:
    """(source, n_docs, sum_len, gini_r9) — the Gini coefficient of the
    CHARACTER-length distribution within each source: 0 when every doc
    has the same length (the uniform-length smell of templated or
    synthetic content), rising toward 1 as a few huge docs carry most
    of the mass. The per-source inequality twin of graphstats'
    degree_gini, and it uses the same no-global-sort construction:
    exact integer rank sums from the per-source LENGTH HISTOGRAM

        G = (2 * sum_i i*l_(i) - (n+1) * sum l) / (n * sum l)

    with the window partitioned BY SOURCE over distinct length values —
    never a sort of the documents themselves. NULL where a source has
    no characters at all.
    """
    from pyspark.sql import Window

    hist = (
        docs.select("source", F.length("text").cast("long").alias("v"))
        .groupBy("source", "v")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn("cprev", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = ranked.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("sl"),
        F.sum(
            F.col("v") * (F.col("c") * F.col("cprev") + F.expr("c * (c + 1) div 2"))
        ).alias("ranksum"),
    )
    g = (
        (F.lit(2) * F.col("ranksum") - (F.col("n") + 1) * F.col("sl"))
        / (F.col("n") * F.col("sl"))
    )
    return agg.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("sl").alias("sum_len"),
        F.when(F.col("sl") > 0, F.round(g, 9)).alias("gini_r9"),
    )


def lexical_richness(docs: DataFrame) -> DataFrame:
    """(source, n_tokens, n_types, n_hapax, ttr_r9, hapax_frac_r9) —
    per-source vocabulary richness: type-token ratio and the hapax-
    legomena fraction (types occurring exactly once in the source).
    Both collapse on templated/looped content (few types, no hapax) and
    sit high on organic text — the lexical siblings of
    repetition_scores' within-doc dup fractions.

    Tokenizer: the shared BPE-ish regex (doc_ngrams / token-hash
    surface), so the numbers compose with the rest of the text stack.
    One (source, token) count then a per-source fold — the token table
    shuffles once on its natural key; all integers, two r9 divisions.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    tok = docs.select("source", F.explode(toks).alias("tok"))
    per_type = tok.groupBy("source", "tok").agg(F.count("*").alias("c"))
    agg = per_type.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_hapax"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / F.col("n_tokens"), 9).alias("ttr_r9"),
        F.round(F.col("n_hapax") / F.col("n_types"), 9).alias("hapax_frac_r9"),
    )
