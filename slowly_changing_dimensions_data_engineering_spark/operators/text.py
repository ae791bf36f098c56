"""Text analysis operators — north-star LLM-pipeline surface.

Language-ID (marker-token heuristic), quality scoring, token counting
(see also ``queries.doc_token_stats``), and rolling-hash document
fingerprinting. Everything is built from ``pyspark.sql.functions`` —
JVM-side, codegen-friendly, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: (Real systems use char n-gram profiles; the *operator shape* — score
#: per language, argmax with deterministic tiebreak — is identical.)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "and", "is", "of", "to"],
    "es": ["el", "la", "los", "y", "es", "que"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), " ")


def marker_score(col, markers: list[str]) -> Column:
    """# tokens that are marker words, as a fraction of all tokens."""
    toks = _tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
    return hits.cast("double") / F.size(toks)


def lang_id(col) -> Column:
    """Predicted language = argmax marker score, ties → alphabetical
    (deterministic CASE chain, reproducible in ANSI SQL)."""
    scores = {lang: marker_score(col, m) for lang, m in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    expr = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text_col, n_chars_col) -> Column:
    """Length/stopword/diversity quality heuristic in [0, 1]:
    0.4·len_score + 0.3·stopword-presence + 0.3·type-token ratio."""
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double") / n
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    return F.round(0.4 * len_score + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
                   + 0.3 * diversity, 9)


def rolling_fingerprint(col, window: int = 8) -> Column:
    """Document fingerprint: md5 over the md5s of each ``window``-token
    rolling block (a winnowing-style content signature — robust to small
    appends, cheap to compare)."""
    toks = _tokens(col)
    blocks = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.md5(F.concat_ws("", blocks))


def doc_profile(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One-pass text-analysis profile used by pipeline filters."""
    return docs.select(
        F.col(id_col),
        lang_id(text_col).alias("pred_lang"),
        quality_score(text_col, "n_chars").alias("quality"),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
        rolling_fingerprint(text_col).alias("fingerprint"),
    )


#: BPE-ish pre-tokenization regex (GPT-2-style splitting, ASCII form):
#: contractions, letter runs, digit runs, single non-alnum marks. The
#: same pattern runs verbatim under Java regex (Spark) and RE2 (DuckDB).
BPE_ISH_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col) -> Column:
    """Regex pre-tokenizer: the subword-style token stream LLM data
    pipelines count against budgets (vs whitespace splitting, which
    undercounts punctuation-dense text). JVM-side regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bigram_repetition(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: the duplicate-2-gram
    fraction and the top-2-gram share (Rae et al. 2021, §A1.1 repetition
    filters — the signals that catch boilerplate and template spam).

    Shape chosen for 100 TB: bigrams explode to rows and aggregate in
    TWO map-side-combinable groupBys ((doc, bigram) then doc) — linear
    in corpus size and shuffle-partitioned by doc — instead of an
    in-array mode search, which is O(len²) per document and dies on long
    documents. Documents with fewer than two tokens have no bigrams and
    are absent from the result (no repetition evidence either way).

    Output: (id, n_bigrams, dup_bigram_frac, top_bigram_frac)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                         lambda a, b: F.concat_ws(" ", a, b))
    ex = docs.select(F.col(id_col), F.explode(bigrams).alias("_bg"))
    per = ex.groupBy(id_col, "_bg").agg(F.count("*").alias("_c"))
    return per.groupBy(id_col).agg(
        F.sum("_c").alias("n_bigrams"),
        F.round((F.sum("_c") - F.count("*")) / F.sum("_c"), 6)
         .alias("dup_bigram_frac"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_bigram_frac"))


#: PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB,
#: Go) execute identically: classes, bounded repeats — no lookaround,
#: no backrefs. Replacement token is [NAME] uppercased.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}",
}


def scrub_pii(df: DataFrame, text_col: str, id_cols: list[str],
              patterns: dict[str, str] | None = None) -> DataFrame:
    """Redact PII-shaped spans and count them per row — the scrub pass a
    training-data pipeline runs over every document before the corpus
    ships. All JVM-side (regexp_extract_all for counts on the ORIGINAL
    text, chained regexp_replace for the redaction), so the pass stays
    inside whole-stage codegen with zero Python in the row path; at
    100 TB it is a pure map over the scan, no shuffle.

    Output: ``id_cols + [scrubbed] + [n_<name> per pattern]``."""
    pats = PII_PATTERNS if patterns is None else patterns
    c = F.col(text_col)
    counts = [F.size(F.regexp_extract_all(c, F.lit(p), 0)).cast("long")
              .alias(f"n_{name}") for name, p in pats.items()]
    scrubbed = c
    for name, p in pats.items():
        scrubbed = F.regexp_replace(scrubbed, p, f"[{name.upper()}]")
    return df.select(*id_cols, scrubbed.alias("scrubbed"), *counts)


def pack_sequences(docs: DataFrame, budget: int, n_shards: int = 64,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Greedy sequence PACKING: assign documents to fixed token-budget
    training sequences (bins), the step between curation and
    tokenization that turns a document set into dense model inputs
    (padding waste = unused budget).

    Greedy next-fit is inherently sequential (each bin depends on every
    earlier doc), so it cannot be a window function; the scalable form
    shards the corpus (documents are exchangeable) and packs each shard
    independently in one Arrow ``applyInPandas`` pass — one shuffle on
    the shard key, Python loops only over each shard's rows, bins named
    (shard, local_bin) so ids never coordinate across shards.
    Deterministic: shard = id mod n_shards (numeric ids; any
    deterministic key function works), in-shard order = id. Docs longer
    than the budget get a bin of their own (fill > 1.0 rather than
    silent truncation — the pipeline decides whether to split or drop).

    Output: one row per document — (id, n_tokens, shard, bin, with the
    bin's fill computable by summing n_tokens over (shard, bin))."""
    import pandas as pd

    toks = F.size(_tokens(text_col)).cast("long")
    base = docs.select(F.col(id_col), toks.alias("n_tokens"),
                       F.pmod(F.col(id_col), F.lit(n_shards))
                        .cast("int").alias("shard"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for t in pdf["n_tokens"]:
            if bins and fill + t > budget:
                b += 1
                fill = 0
            fill += int(t)
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    schema = ("{} long, n_tokens long, shard int, bin long"
              .format(id_col))
    return base.groupBy("shard").applyInPandas(pack, schema=schema)


def chunk_documents(docs: DataFrame, chunk_chars: int = 200,
                    overlap: int = 50, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the chunking pass an embedding/RAG pipeline runs before encoding
    (long documents exceed encoder context; overlap keeps boundary
    sentences attached to both sides).

    Chunk i covers characters ``[i*step, i*step + chunk_chars)`` with
    ``step = chunk_chars - overlap``; a document shorter than one chunk
    yields itself. All in-plan: the window starts are a
    ``sequence``/``transform`` over the row's own length and the chunks
    a ``posexplode`` — a generator inside whole-stage codegen, so the
    corpus streams through with NO shuffle at all (chunking is
    embarrassingly row-parallel; output size ≈ input × (1 + overlap /
    step)). Returns (id, chunk_id, chunk) with chunk_id 0-based.
    """
    step = chunk_chars - overlap
    if step <= 0:
        raise ValueError("chunk_documents: overlap must be < chunk_chars")
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / float(step)))
    chunks = F.transform(
        F.sequence(F.lit(0), n.cast("int") - 1),
        lambda i: F.col(text_col).substr(i * step + 1, F.lit(chunk_chars)))
    return (docs.select(F.col(id_col), F.posexplode(chunks)
                        .alias("chunk_id", "chunk"))
            .select(id_col, F.col("chunk_id").cast("long"), "chunk"))


def _bpe_merge_fold(syms: Column, left: str, right: str) -> Column:
    """Apply ONE BPE merge rule (left, right) -> left||right to a symbol
    array, greedy left-to-right non-overlapping — the standard rule
    (Sennrich et al. 2016). A pure codegen fold: the accumulator array
    either absorbs the incoming symbol into its last element (when the
    last element is ``left`` and the symbol is ``right``) or appends it.
    Greediness falls out of the fold order, and the a==b overlap case
    ([a,a,a] -> [aa,a], never [a,aa]) is handled because a merged last
    element ``left||right`` is strictly longer than ``left`` and can
    never re-match it."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)))
        .otherwise(F.concat(acc, F.array(s))))


def bpe_train(docs: DataFrame, n_merges: int = 12, text_col: str = "text",
              ) -> tuple[DataFrame, DataFrame]:
    """Train a byte-pair-encoding merge table against the corpus — the
    iterative best-pair selection loop proper, completing the tokenizer
    story started by the counting queries (``bpe_token_stats``,
    ``token_freq_topk``).

    Algorithm (Sennrich et al. 2016, the shape HuggingFace trainers
    use): the corpus collapses ONCE to a word-frequency vocabulary;
    every subsequent round runs over that vocabulary only —
    (1) count adjacent symbol pairs weighted by word frequency (each
    position counts, so [a,a,a] contributes (a,a) twice),
    (2) pick the globally most frequent pair — ties broken by (left,
    right) ascending so the choice is deterministic cross-engine,
    (3) rewrite every word's symbol array through the greedy fold
    (:func:`_bpe_merge_fold`).

    100 TB shape: the corpus is touched exactly once (the word-count
    shuffle — uniform keys, map-side partial agg). The iterated object
    is the DISTINCT-WORD table, which Zipf keeps orders of magnitude
    smaller than the corpus and which stays fully distributed — per
    round: one explode + pair-count aggregate over the vocab (partial
    agg, uniform md5-free string keys), one argmax via
    ``orderBy().limit(1)`` whose driver collect is exactly ONE row, and
    one codegen fold rewrite. ``stabilize()`` materializes the vocab
    each round so lineage/expression depth stays O(1) across rounds,
    the same discipline as ``kmeans_fit``/connected components.

    Returns ``(merges, vocab)``: ``merges`` = (merge_rank, left_sym,
    right_sym, pair_freq, new_token), rank 1-based in training order —
    dictionary-sized (n_merges rows, built on the driver like the
    k-row kmeans centroid frame); ``vocab`` = (word, cnt, syms) with
    the final segmentation."""
    from ..session import stabilize
    spark = docs.sparkSession
    words = (docs.select(F.explode(_tokens(text_col)).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("cnt")))
    cur = stabilize(words.withColumn(
        "syms", F.filter(F.split("word", ""), lambda x: x != "")))
    merges: list[tuple] = []
    for rank in range(1, max(0, n_merges) + 1):
        pair = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(F.get("syms", i - 1).alias("l"),
                               F.get("syms", i).alias("r")))
        best = (cur.filter(F.size("syms") >= 2)
                .select("cnt", F.explode(pair).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("cnt").alias("pf"))
                .orderBy(F.desc("pf"), "l", "r")
                .limit(1).collect())
        if not best:
            break
        left, right, pf = best[0]["l"], best[0]["r"], best[0]["pf"]
        merges.append((rank, left, right, pf, left + right))
        cur = stabilize(cur.withColumn(
            "syms", _bpe_merge_fold(F.col("syms"), left, right)))
    merges_df = spark.createDataFrame(
        merges, schema="merge_rank long, left_sym string, right_sym string,"
                       " pair_freq long, new_token string")
    return merges_df, cur


def bpe_segment(df: DataFrame, syms_col: str,
                merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a TRAINED merge table to a symbol-array column, in rank
    order — tokenization with a fixed vocabulary, the inference side of
    :func:`bpe_train`. Pure codegen: each merge is one
    :func:`_bpe_merge_fold` wrap, so the whole merge table compiles
    into a single projection over the scan — no shuffle, no Python,
    embarrassingly row-parallel at any corpus size. Expression depth is
    O(len(merges)); for merge tables beyond a few hundred rules, apply
    in stages with a ``stabilize()`` between (same lineage discipline
    as training)."""
    c = F.col(syms_col)
    for left, right in merges:
        c = _bpe_merge_fold(c, left, right)
    return df.withColumn(syms_col, c)


def _viterbi_dp(cand_rows: Column) -> Column:
    """Forward Viterbi pass over one word's candidate-piece rows —
    ``cand_rows`` is the e-ascending array of per-position candidate
    arrays (``cands[j-1]`` = logp of the j-char piece ENDING at
    position e, NULL when the piece is out-of-vocabulary or j > e).
    The piece-length bound is already encoded in the candidate arrays
    (each has exactly ``min(max_len, e)`` slots), so the DP needs no
    separate length parameter.

    Pure codegen fold with a flat ``array<double>`` accumulator in the
    interleaved layout ``[best_0, best_1, bp_1, best_2, bp_2, ...]``
    (best_k = best segmentation log-prob of the k-char prefix, bp_k =
    the length of its last piece) — flat doubles rather than a struct
    because the SAME fold must be restatable in the DuckDB oracle,
    whose ``list_reduce`` only folds elements of the accumulator's own
    type. Ties take the SHORTEST piece (first argmax position), the
    cross-engine-deterministic rule. Unreachable states carry -1e18;
    they never win because every single character stays in-vocabulary
    by construction (see :func:`unigram_lm_fit`)."""
    def step(acc, cands):
        e = ((F.size(acc) + 1) / 2).cast("int")

        def score(lp, i):
            j = (i + F.lit(1)).cast("int")  # Spark transform idx is 0-based
            k = e - j
            prev = F.when(k == 0, F.element_at(acc, 1)) \
                    .otherwise(F.element_at(acc, (2 * k).cast("int")))
            return F.when(lp.isNull(), F.lit(-1e18)).otherwise(prev + lp)

        scores = F.transform(cands, score)
        m = F.array_max(scores)
        js = F.array_position(scores, m).cast("double")
        return F.concat(acc, F.array(m, js))

    return F.aggregate(cand_rows, F.array(F.lit(0.0)), step)


def _viterbi_traceback(dp: Column, word: Column) -> Column:
    """Walk the backpointers of a :func:`_viterbi_dp` result from the
    end of the word to position 0 — another flat ``array<double>``
    fold (``[cur_pos, end_1, len_1, end_2, len_2, ...]``, pieces
    accumulating LAST-FIRST): iterating positions n..1, a position
    matching the cursor emits its (end, backpointer-length) pair and
    jumps the cursor back; every other position is a no-op. Same
    DuckDB-restatable-flat-fold rationale as the forward pass."""
    n = F.length(word)

    def step(acc, i):
        jj = F.element_at(dp, (2 * i + 1).cast("int"))
        return F.when(
            i == F.element_at(acc, 1),
            F.concat(F.array(i - jj),
                     F.slice(acc, 2, F.size(acc) - 1),
                     F.array(i, jj))).otherwise(acc)

    return F.aggregate(
        F.transform(F.sequence(n, F.lit(1), F.lit(-1)),
                    lambda i: i.cast("double")),
        F.array(n.cast("double")), step)


def unigram_lm_fit(docs: DataFrame, rounds: int = 3, max_len: int = 4,
                   seed_vocab: int = 128, text_col: str = "text",
                   ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a unigram-LM (SentencePiece-style, Kudo 2018) subword
    vocabulary against the corpus — the EM counterpart of
    :func:`bpe_train`: instead of greedily growing merges, start from
    a substring seed vocabulary and alternate (E) Viterbi-segmenting
    every word under the current piece log-probabilities with (M)
    re-estimating those probabilities from the segmentation's piece
    usage, pruning pieces that no best-segmentation uses.

    Algorithm (hard-EM / Viterbi variant of Kudo's algorithm — the
    E-step takes the argmax segmentation rather than full
    forward-backward expectations; pruning is use-it-or-lose-it
    rather than loss-ranked, the standard simplification):

    1. the corpus collapses ONCE to the distinct-word frequency table
       (exactly ``bpe_train``'s first shuffle);
    2. seed vocabulary: every ≤ ``max_len``-char substring of every
       word, occurrence-weighted by word frequency; the top
       ``seed_vocab`` by (count DESC, piece ASC) — a distributed
       TakeOrdered(K), no global sort — UNION every single character
       (segmentability guarantee); seed logp = round(ln(cnt/total),9);
    3. per round r = 0..R: E-step = one codegen Viterbi pass over the
       DISTINCT-WORD table (:func:`_viterbi_dp` + traceback; the
       vocabulary joins in by piece — hash join, never broadcast by
       construction), metrics = one decimal-exact aggregate; then for
       r < R the M-step: piece usage counts in one aggregate,
       survivors = used pieces ∪ single characters, new logp =
       round(ln((use+1)/(total+V)), 9) — add-1 smoothed so a
       resurrected zero-use character stays finite (the repo's LM-gate
       convention).

    100 TB shape: identical to ``bpe_train`` — the corpus is touched
    once; every per-round frame (candidates, DP, usage counts) is
    distinct-word- or piece-sized, fully distributed, shuffled on
    uniform string keys with map-side partial aggregation; driver
    collects are the 1-row metric aggregates only. ``stabilize()``
    pins each round's vocabulary (multi-consumer + iterative lineage,
    the kmeans_fit discipline).

    Returns ``(vocab, metrics, seg)``: ``vocab`` = final (piece, logp);
    ``metrics`` = (round, vocab_size, total_ll, avg_pieces) for rounds
    0..R, each evaluated UNDER that round's vocabulary (so the
    log-likelihood trajectory is the EM witness — non-decreasing per
    round is property-tested, not assumed); ``seg`` = the final
    segmentation (word, cnt, n_pieces, best_ll, pieces left-to-right)
    under the final vocabulary."""
    from pyspark.sql import types as T

    from ..session import stabilize
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = docs.sparkSession
    words = stabilize(
        docs.select(F.explode(_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("cnt")))

    # candidate (end, len, piece) explode — shared by the seed count
    # and every E-step round, so materialize it once
    wl = F.length("word")
    cand_structs = F.flatten(F.transform(
        F.sequence(F.lit(1), wl),
        lambda e: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_len), e)),
            lambda j: F.struct(
                e.alias("e"), j.alias("j"),
                F.col("word").substr(e - j + 1, j).alias("piece")))))
    cand = stabilize(
        words.select("word", "cnt", F.explode(cand_structs).alias("c"))
        .select("word", "cnt", F.col("c.e").alias("e"),
                F.col("c.j").alias("j"), F.col("c.piece").alias("piece")))
    chars = stabilize(
        words.select(F.explode(
            F.filter(F.split("word", ""), lambda x: x != "")).alias("piece"))
        .distinct())

    # seed vocabulary: occurrence-weighted substring counts, top-K via
    # TakeOrdered, single chars re-joined (anti-join avoids doubles)
    pcounts = cand.groupBy("piece").agg(F.sum("cnt").alias("pcnt"))
    top = pcounts.orderBy(F.desc("pcnt"), "piece").limit(seed_vocab)
    sel = top.unionByName(
        pcounts.join(chars, "piece", "left_semi")
        .join(top.select("piece"), "piece", "left_anti"))
    tot = sel.agg(F.sum("pcnt").cast("double").alias("t"))
    vocab = stabilize(
        sel.crossJoin(F.broadcast(tot))
        .select("piece",
                F.round(F.log(F.col("pcnt") / F.col("t")), 9).alias("logp")))

    metric_rows: list[tuple[int, int, float, float]] = []
    seg = None
    for r in range(rounds + 1):
        # E-step: per-position candidate arrays -> forward DP ->
        # traceback -> (n_pieces, best_ll, pieces)
        cj = (cand.join(vocab, "piece", "left")
              .select("word", "cnt", "e", "j", "logp"))
        ce = (cj.groupBy("word", "cnt", "e")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("j", "logp"))),
                  lambda s: s["logp"]).alias("cands")))
        de = (ce.groupBy("word", "cnt")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("e", "cands"))),
                  lambda s: s["cands"]).alias("rows")))
        dpf = de.select("word", "cnt",
                        _viterbi_dp(F.col("rows")).alias("dp"))
        tbf = dpf.select("word", "cnt", "dp",
                         _viterbi_traceback(F.col("dp"), F.col("word"))
                         .alias("tb"))
        np_ = ((F.size("tb") - 1) / 2).cast("long")
        best = F.element_at(F.col("dp"), (2 * F.length("word")).cast("int"))
        pieces = F.reverse(F.transform(
            F.sequence(F.lit(1), ((F.size("tb") - 1) / 2).cast("int")),
            lambda k: F.col("word").substr(
                (F.element_at(F.col("tb"), (2 * k).cast("int"))
                 - F.element_at(F.col("tb"), (2 * k + 1).cast("int"))
                 + 1).cast("int"),
                F.element_at(F.col("tb"), (2 * k + 1).cast("int"))
                .cast("int"))))
        seg = stabilize(tbf.select(
            "word", "cnt", np_.alias("n_pieces"), best.alias("best_ll"),
            pieces.alias("pieces")))

        vsize = vocab.count()  # bounded: the piece dictionary
        mrow = seg.agg(
            F.round(F.sum((F.col("cnt") * F.col("best_ll"))
                          .cast("decimal(38,12)")).cast("double"), 6)
            .alias("total_ll"),
            F.round(F.sum(F.col("cnt") * F.col("n_pieces")).cast("double")
                    / F.sum("cnt"), 6).alias("avg_pieces")).collect()[0]
        metric_rows.append((r, int(vsize), float(mrow["total_ll"]),
                            float(mrow["avg_pieces"])))
        if r == rounds:
            break

        # M-step: usage counts -> survivors (∪ single chars) -> add-1
        # smoothed log-probabilities
        u = (seg.select("cnt", F.explode("pieces").alias("piece"))
             .groupBy("piece").agg(F.sum("cnt").alias("ucnt")))
        sv = u.select("piece").unionByName(chars).distinct()
        st = (u.agg(F.sum("ucnt").cast("double").alias("total"))
              .crossJoin(F.broadcast(sv.agg(F.count("*").alias("v")))))
        vocab = stabilize(
            sv.join(u, "piece", "left")
            .crossJoin(F.broadcast(st))
            .select("piece",
                    F.round(F.log((F.coalesce(F.col("ucnt"), F.lit(0)) + 1)
                                  / (F.col("total") + F.col("v"))), 9)
                    .alias("logp")))

    mschema = T.StructType([
        T.StructField("round", T.LongType()),
        T.StructField("vocab_size", T.LongType()),
        T.StructField("total_ll", T.DoubleType()),
        T.StructField("avg_pieces", T.DoubleType())])
    return vocab, spark.createDataFrame(metric_rows, mschema), seg
