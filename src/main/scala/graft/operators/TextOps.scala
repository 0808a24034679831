package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.bind

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are
  * pure Catalyst column expressions (codegen'd higher-order functions,
  * no UDFs), so they pipeline inside whole-stage codegen over a
  * parquet scan of `documents`.
  *
  * Cross-engine determinism notes (for the DuckDB oracles): integer
  * folds are exact; ratios are single double divisions of exact ints;
  * the polynomial fingerprint stays below 2^60 via mod 1e9+7.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (split keeps leading empties). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Sentence-aware budgeted chunking — the context-window packing
    * that never splits a sentence (the RAG/pretraining-prep
    * alternative to [[chunks]]' fixed token windows, which cut
    * mid-sentence): sentences split on `[.!?]+` runs, each assigned
    * to chunk ⌊tokens-before-it / budget⌋ — a PREFIX-SUM rule, so a
    * straddling sentence joins the chunk its first token lands in
    * and chunks overflow by at most one sentence. The prefix rule is
    * what makes the packing deterministic and SQL-replayable (a
    * greedy fill-then-reset walk is sequential state no oracle could
    * follow — the same trade the CDC chunker documents).
    *
    * Scale shape: one sentence explode (map-side), ONE shuffle by doc
    * for the per-doc prefix window (sentences-per-doc-sized frames),
    * then the (doc, chunk) agg reuses the doc partitioning. Output:
    * (id, chunk_id, n_sentences, n_tokens) — chunk ids are floor
    * quotients, so a sentence longer than the budget skips ids
    * (deterministic, documented).
    */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Int): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    val w = Window.partitionBy("id").orderBy("si")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "[.!?]+")).as(Seq("si", "sent")))
      .select(col("id"), col("si"),
        size(tokens(col("sent"))).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .withColumn("cumb", coalesce(sum("nt").over(w), lit(0L)))
      .groupBy(col("id"), expr(s"cumb div $tokenBudget").as("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"), sum("nt").as("n_tokens"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer segment pattern — the GPT-2 pre-tokenizer
    * alternation (contractions, space-prefixed letter runs, digit
    * runs, punctuation runs, residual whitespace) restricted to the
    * Java-regex/RE2 SHARED subset: the original's `\s+(?!\S)`
    * lookahead only shifts one space between a whitespace run and the
    * following token, never changing the SEGMENT COUNT, so dropping
    * it keeps counts identical while staying replayable in RE2
    * engines (DuckDB). Token COUNT under this pattern tracks real
    * BPE token counts far better than whitespace counting (digits,
    * punctuation, and contractions segment separately) — the budget/
    * billing heuristic, not a vocabulary encoding.
    */
  val BpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Count of BPE-ish pre-tokenizer segments (see [[BpeishPattern]]). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Flesch–Kincaid readability as EXACT integer micros — the
    * classic text-difficulty feature beside [[qualityScore]] (a
    * too-hard/too-degenerate filter axis for pretraining curation).
    * Heuristic counts, all regex-countable in the Java/RE2 shared
    * subset: words = whitespace tokens; sentences = max(1, count of
    * `[.!?]+` runs); syllables = maximal lowercase vowel runs
    * `[aeiouy]+` over the whole text (zero-vowel words contribute 0
    * — the per-word ≥1 floor is deliberately NOT applied: it would
    * need a per-word explode for a heuristic correction smaller than
    * the heuristic's own error). The published coefficients ride
    * per-term floor-div micros (the estimator is the contract):
    *   grade  = 0.39·w/s + 11.8·syl/w − 15.59
    *   ease   = 206.835 − 1.015·w/s − 84.6·syl/w
    * Map-only over the scan; empty docs (w = 0) report NULL.
    */
  def readabilityMetrics(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))),
          lit(1)).cast("long").as("n_sentences"),
        size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("fk_grade_micros", when(col("n_words") > 0,
        expr("(390000 * n_words) div n_sentences")
          + expr("(11800000 * n_syllables) div n_words")
          - lit(15590000L)))
      .withColumn("reading_ease_micros", when(col("n_words") > 0,
        lit(206835000L)
          - expr("(1015000 * n_words) div n_sentences")
          - expr("(84600000 * n_syllables) div n_words")))

  /** Encoding-health patterns — spelled entirely with `\x{hhhh}`
    * escapes (no raw special chars in the pattern string), in the
    * Java/RE2 shared subset, so the same literal pattern text runs in
    * both engines.
    */
  /** The Unicode replacement char a lossy decode leaves behind. */
  val ReplacementRe = "\\x{FFFD}"
  /** C1 control block — legal Unicode, near-certain decode damage in
    * text (CP1252 bytes read as Latin-1).
    */
  val C1ControlRe = "[\\x{0080}-\\x{009F}]"
  /** Classic UTF-8-read-as-Latin-1 double-encode digraphs: Ã +
    * continuation (2-byte chars), â€ + curly-punct tail (3-byte
    * chars), Â + nbsp/©/«/» (the stranded-prefix form).
    */
  val MojibakeRe =
    "\\x{00C3}[\\x{0080}-\\x{00BF}]" +
      "|\\x{00E2}\\x{20AC}[\\x{2122}\\x{201C}\\x{201D}\\x{02DC}\\x{00A6}]" +
      "|\\x{00C2}[\\x{00A0}\\x{00A9}\\x{00AB}\\x{00BB}]"

  /** Encoding-health audit — the decode-damage gate a crawl pipeline
    * runs before any text op trusts the bytes: per doc, counts of
    * replacement chars, C1 controls, and mojibake digraphs, plus the
    * all-clear verdict. Map-only regex counting over the scan.
    */
  def encodingHealth(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        size(regexp_extract_all(col(textCol), lit(ReplacementRe), lit(0)))
          .cast("long").as("n_replacement"),
        size(regexp_extract_all(col(textCol), lit(C1ControlRe), lit(0)))
          .cast("long").as("n_c1"),
        size(regexp_extract_all(col(textCol), lit(MojibakeRe), lit(0)))
          .cast("long").as("n_mojibake"))
      .withColumn("healthy",
        col("n_replacement") === 0 && col("n_c1") === 0
          && col("n_mojibake") === 0)

  /** Stopword list used by quality scoring + language ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  /** Language marker profiles (tiny n-gram/stopword heuristic — the
    * classic cheap language-ID signal; deterministic, SQL-expressible).
    * Tie-break order is the Seq order.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "que", "y", "es"),
    "nl" -> Seq("de", "het", "een", "en", "van"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Heuristic language ID: argmax of profile-marker hits, 'und'
    * (undetermined) when nothing matches. Deterministic tie-break by
    * profile order.
    */
  def langId(text: Column): Column = {
    // single pass over tokens: marker-word → profile-index map lookup,
    // one 5-slot counter array folded along the way (vs 25
    // array_contains scans per token)
    val markerToIdx: Seq[(String, Int)] = LangProfiles.zipWithIndex
      .flatMap { case ((_, ws), i) => ws.map(_ -> i) }
    val lookup = map(markerToIdx.flatMap { case (w, i) =>
      Seq(lit(w), lit(i))
    }: _*)
    val counts = aggregate(
      tokens(lower(text)),
      array((0 until LangProfiles.size).map(_ => lit(0)): _*),
      (acc, t) =>
        zip_with(acc, array((0 until LangProfiles.size).map(i => lit(i)): _*),
          (a, i) => a + when(element_at(lookup, t) === i, 1).otherwise(0)))
    bind(counts) { scores =>
      val best = aggregate(scores, lit(0), (acc, x) => greatest(acc, x))
      LangProfiles.map(_._1).zipWithIndex
        .foldRight(lit("und"): Column) { case ((l, i), acc) =>
          when(element_at(scores, i + 1) === best && best > 0, lit(l))
            .otherwise(acc)
        }
    }
  }

  /** Quality features: char/token counts, mean token length, stopword
    * ratio, punctuation ratio, uppercase-start ratio — the standard
    * cheap corpus-quality signals.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val sumTokLen = aggregate(transform(toks, t => length(t)),
      lit(0), (acc, x) => acc + x)
    val nStop = countIn(tokens(lower(text)), EnglishStopwords)
    val nPunct = nChars - length(regexp_replace(text, "[.,;:!?'\"()-]", ""))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "mean_token_len" -> (sumTokLen.cast("double") / nTok.cast("double")),
      "stopword_ratio" -> (nStop.cast("double") / nTok.cast("double")),
      "punct_ratio" -> (nPunct.cast("double") / nChars.cast("double")))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * sane token lengths, penalizes extreme punctuation. Single double
    * expression over exact-int ratios → cross-engine deterministic.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_tokens") >= 10 && f("n_tokens") <= 1000, 1.0)
      .otherwise(0.5)
    val stop = least(f("stopword_ratio") * 4.0, lit(1.0))
    val punct = greatest(lit(0.0), lit(1.0) - f("punct_ratio") * 5.0)
    (lenOk * 0.4 + stop * 0.4 + punct * 0.2)
  }

  /** PII scrubbing: replace e-mail addresses, international-ish phone
    * numbers, and IPv4 literals with typed placeholder tokens —
    * map-only regexp passes that pipeline inside codegen over the
    * scan, the standard pre-training redaction step.
    *
    * Patterns deliberately use only the regex subset with identical
    * semantics in Java (Spark) and RE2 (DuckDB/others): character
    * classes, bounded repetition, alternation — no backreferences, no
    * lookaround — so the scrub replays bit-for-bit in the oracle.
    * Order matters and is fixed: e-mail first (an e-mail's domain
    * would otherwise partly match the phone pattern's digit runs).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}[- .][0-9]{3,4}[- .][0-9]{3,4}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** Count of PII matches (pre-redaction), for audit columns.
    * Group index 0 = whole match (the default 1 requires a capture
    * group, and these patterns deliberately have none).
    */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  /** Default phrase blocklist for [[blocklistScreen]]'s catalog entry:
    * multi-word literals over the synthetic corpus vocabulary,
    * including self-overlapping shapes ("batch batch" occurs TWICE in
    * "batch batch batch" under all-occurrence counting — the
    * overlap-vs-replace-count discriminator the oracle pins).
    */
  val DefaultBlocklist: Seq[String] = Seq(
    "batch batch", "slow merge", "spark window", "vector join",
    "the lazy", "hash hash")

  /** Phrase-blocklist screen (the C4/RefinedWeb badword-filter shape):
    * per doc, total occurrences of any of m literal phrases —
    * overlapping included — plus how many distinct phrases hit and
    * the block decision (hits ≥ minHits OR distinct ≥ minPatterns).
    *
    * The count runs in the native Aho–Corasick kernel
    * (expressions.AhoCorasickCounts): ONE automaton pass per doc,
    * O(bytes + matches) regardless of m — the composable alternative
    * is m regexp scans, i.e. m full passes over every crawled byte,
    * which is exactly what a production blocklist (hundreds of
    * phrases) cannot afford at corpus scale. Map-only; pipelines
    * inside whole-stage codegen over the parquet scan.
    */
  def blocklistScreen(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String] = DefaultBlocklist,
      minHits: Int = 3,
      minPatterns: Int = 2): DataFrame =
    df.select(col(idCol),
        graft.expressions.AhoCorasickCounts.of(col(textCol), patterns)
          .as("cnts"))
      .select(col(idCol),
        aggregate(col("cnts"), lit(0L), (a, c) => a + c).as("hits"),
        size(filter(col("cnts"), c => c > 0L)).as("n_patterns_hit"))
      .withColumn("blocked",
        col("hits") >= minHits || col("n_patterns_hit") >= minPatterns)

  /** Card-shaped digit run: 13–19 digits, optional single space/dash
    * between digit groups. Same Java/RE2-safe regex subset as the
    * patterns above. Deliberately WIDE — [[redactCards]] scrubs every
    * card-shaped run (over-redaction is the safe direction for
    * training data); [[luhnValid]] is the precision audit that says
    * how many were checksum-real cards, NOT a gate on scrubbing.
    */
  val CardRe = "\\b(?:[0-9][- ]?){12,18}[0-9]\\b"

  def redactCards(text: Column): Column =
    regexp_replace(text, CardRe, "<CARD>")

  /** Luhn mod-10 checksum (ISO/IEC 7812) of an all-digit string,
    * positional arithmetic from the RIGHT (double every second
    * digit, −9 past 9), as one codegen'd higher-order aggregate —
    * no UDF, and the identical integer expression replays in the
    * oracle. Input contract: digits only (normalize with
    * regexp_replace(s, "[^0-9]", "") first).
    */
  def luhnSum(digits: Column): Column =
    aggregate(
      sequence(lit(1), length(digits)),
      lit(0),
      (acc, i) => {
        val dig =
          ascii(digits.substr(length(digits) - i + lit(1), lit(1))) -
            lit(48)
        val dbl = dig * 2
        acc + when(i % 2 === 0,
          when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(dig)
      })

  /** True when the digit string passes Luhn (≥ 2 digits — a single
    * check digit alone is vacuous).
    */
  def luhnValid(digits: Column): Column =
    length(digits) >= 2 && luhnSum(digits) % 10 === 0

  /** DuckDB rendering of [[luhnSum]] over digit-string SQL `dg` —
    * the identical positional integer arithmetic.
    */
  def luhnSumSql(dg: String): String =
    s"""list_sum(list_transform(range(1, length($dg) + 1), i ->
       |  CASE WHEN i % 2 = 0 THEN
       |    CASE WHEN 2 * (ascii(substr($dg, length($dg) - i + 1, 1)) - 48) > 9
       |         THEN 2 * (ascii(substr($dg, length($dg) - i + 1, 1)) - 48) - 9
       |         ELSE 2 * (ascii(substr($dg, length($dg) - i + 1, 1)) - 48) END
       |  ELSE ascii(substr($dg, length($dg) - i + 1, 1)) - 48 END))""".stripMargin

  /** Polynomial rolling fingerprint of the full text
    * (h = h*31 + code, mod 1e9+7): deterministic, SQL-expressible,
    * order-sensitive (unlike a bag-of-words hash).
    */
  val FingerprintMod = 1000000007L

  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) > 0),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % FingerprintMod)

  /** Word n-gram shingles (joined with ''), the unit for
    * Jaccard/MinHash dedup.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(shinglesAll(text, n))

  /** Overlapping token-window chunks — pretraining prep: split long
    * documents into `window`-token pieces every `stride` tokens
    * (stride < window ⇒ overlap). Chunk i covers tokens
    * [i·stride, i·stride+window); the last chunk starts at the final
    * stride step that still adds tokens, so every token lands in ≥1
    * chunk and a ≤window doc is exactly one chunk. Pure map-only
    * column expression (one explode downstream — no shuffle, no
    * state), so it scales trivially and replays in SQL: chunk count
    * is the exact integer ⌈(n−window)/stride⌉+1 and slicing is
    * engine-portable.
    */
  def chunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunks: need 0 < stride <= window, got window=$window stride=$stride")
    bind(tokens(text)) { toks =>
      val nChunks = when(size(toks) <= window, lit(1))
        .otherwise(((size(toks) - window + (stride - 1)) / stride).cast("int")
          + 1)
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(window))))
    }
  }

  /** Set-form shingles with NO whole-text fallback: documents shorter
    * than `n` tokens contribute nothing. This is the decontamination
    * contract — a 2-token doc must not register a spurious whole-text
    * collision against an eval set — and matches the oracle's
    * `WHERE len(toks) >= n` exactly. The dedup paths keep the
    * [[shingles]] fallback on purpose: there, a short doc must still
    * produce a signature so exact-duplicate short docs can pair.
    */
  def shinglesStrict(text: Column, n: Int): Column =
    bind(tokens(text)) { toks =>
      when(size(toks) >= n,
        array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws("", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>"))
    }

  /** Ordered, non-distinct shingles — the sequence form winnowing
    * needs (window positions are meaningful). `shingles` is the set
    * form for Jaccard.
    */
  def shinglesAll(text: Column, n: Int): Column =
    bind(tokens(text)) { toks =>
      val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
      when(size(toks) >= n,
        transform(idx, i => concat_ws("", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws("", toks)))
    }

  /** Base-31 polynomial fold of a string column mod 1e9+7 — the HOF
    * rendering of TextSketchKernels' shingle hash (and of the DuckDB
    * list_reduce oracle).
    */
  def polyFold31(s: Column): Column =
    aggregate(
      filter(split(s, ""), c => length(c) > 0),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % FingerprintMod)

  /** Ordered shingle-hash array, HOF rendering — semantic reference
    * for the native graft.expressions.TextShingleHashes (equality
    * asserted in TextMultimodalSpec).
    */
  def shingleHashesHof(text: Column, n: Int): Column =
    transform(shinglesAll(text, n), s => polyFold31(s))

  /** 60-bit per-token hash (two folds, bits 0..29 and 30..59) — HOF
    * reference for TextSketchKernels.combined60.
    */
  def combined60Hof(t: Column): Column =
    bind(filter(split(t, ""), c => length(c) > 0)) { cs =>
      val h1 = aggregate(cs, lit(0L),
        (acc, c) => (acc * 31L + ascii(c).cast("long")) % FingerprintMod)
      val h2 = aggregate(cs, lit(0L),
        (acc, c) => (acc * 131L + ascii(c).cast("long")) % 998244353L)
      h1 + shiftleft(h2, 30)
    }

  /** SimHash, HOF rendering — semantic reference for the native
    * graft.expressions.TextSimHash (bit b set when strictly more token
    * hashes have it set than clear).
    */
  def simhashHof(text: Column): Column =
    bind(transform(tokens(text), t => combined60Hof(t))) { hs =>
      (0 until 60).map { b =>
        val setCnt = size(filter(hs,
          h => shiftright(h, b).bitwiseAND(1L) === 1L))
        when(setCnt * 2 - size(hs) > 0, shiftleft(lit(1L), b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * k-gram rolling hashes, minimum per sliding window of w — the
    * standard near-dup fingerprint set. Returns an array of selected
    * hashes (distinct, sorted) per document. Hashes are the native
    * one-pass shingle fold (poly mod 1e9+7 — deterministic and
    * DuckDB-replayable, unlike xxhash64).
    */
  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowFromHashes(graft.expressions.TextShingleHashes(text, k), w)

  /** HOF-rendered reference (same values; TextMultimodalSpec). */
  def winnowingFingerprintsHof(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowFromHashes(shingleHashesHof(text, k), w)

  private def winnowFromHashes(hashCol: Column, w: Int): Column =
    bind(hashCol) { hashes =>
      val nWin = greatest(size(hashes) - w + 1, lit(1))
      val mins = transform(sequence(lit(0), nWin - 1),
        i => array_min(slice(hashes, i + 1, lit(w))))
      array_sort(array_distinct(mins))
    }

  /** First BPE merge-round pair counts (Sennrich et al., ACL'16 §3):
    * frequency of every adjacent character pair, weighted by word
    * frequency — the argmax is the first merge a BPE tokenizer learns.
    * Repeated pairs inside one word each count ("aaa" contributes
    * "aa" twice per occurrence).
    *
    * Scale: the corpus shuffles ONCE into the word-frequency vocab
    * (map-side combined); pair explosion runs over the VOCAB, not the
    * corpus (web-scale corpora: ~10^7 distinct words vs ~10^11
    * tokens), and the output pair table is alphabet²-bounded. This
    * vocab-first factoring is exactly why real BPE trainers consume
    * word-count tables, not raw text.
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    // sequence(0, len-2) needs len >= 2: Spark renders sequence(0,-1)
    // as a DESCENDING [0,-1], not empty — 1-char words must filter out
    vocab.filter(length(col("w")) >= 2)
      .select(col("wc"),
        explode(transform(sequence(lit(0), length(col("w")) - 2),
          i => concat(col("w").substr(i + 1, lit(1)),
            col("w").substr(i + 2, lit(1))))).as("pair"))
      .groupBy("pair").agg(sum("wc").as("cnt"))
  }

  /** Symbol separator for the BPE training loop: words are carried as
    * their symbol sequence joined by this char (U+001F, unit
    * separator — contract: corpus text must not contain it), which
    * makes applying a merge exactly `replace(w, a+SEP+b, a+b)` —
    * string replace is left-to-right non-overlapping in Spark AND
    * DuckDB, i.e. PRECISELY greedy BPE merge semantics ("aaa" with
    * merge (a,a) → [aa, a]). No custom fold, no island logic.
    */
  val BpeSep = "\u001F"

  /** The BPE trainer inner loop (Sennrich et al. ACL'16), `rounds`
    * merges: count weighted adjacent symbol pairs over the VOCAB
    * (corpus → word counts once — the vocab-first factoring real
    * trainers use), pick the most frequent pair (ties by symbol
    * pair, fully ordered — deterministic), apply it everywhere,
    * repeat. Returns the learned merge table (round, a, b, cnt) —
    * the artifact a tokenizer trainer ships.
    *
    * Per-round driver action: ONE collected row (the argmax pair) —
    * the same bounded-collect exception as the k-means center
    * model. Scale shape: pair counting reduces the vocabulary table
    * (sub-linear in corpus, Heaps' law), never the corpus; the merge
    * apply is a map-side string replace over the vocab.
    */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // localCheckpoint per round: each vocab is read twice (pair argmax
    // + merge apply) and feeds the next round — without materializing,
    // round r would replay every earlier round's corpus scan
    var vocab = df.select(explode(tokens(col(textCol))).as("w0"))
      .groupBy("w0").agg(count(lit(1)).as("wc"))
      .select(concat_ws(BpeSep,
        filter(split(col("w0"), ""), c => length(c) > 0)).as("w"),
        col("wc"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val s = split(col("w"), BpeSep)
      val best = vocab
        .filter(size(s) >= 2)
        .select(col("wc"), explode(transform(sequence(lit(0), size(s) - 2),
          i => struct(element_at(s, i + 1).as("a"),
            element_at(s, i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r, a, b, c))
        vocab = vocab.select(
          call_function("replace", col("w"), lit(a + BpeSep + b),
            lit(a + b)).as("w"),
          col("wc"))
          .localCheckpoint()
        r += 1
      }
    }
    learned.toSeq.toDF("round", "a", "b", "cnt")
  }

  /** Apply a trained merge list ([[bpeTrain]]'s output, in round
    * order) to tokenize the corpus — the ENCODE side of the BPE
    * pair: per-document word count, subtoken count under the learned
    * vocab, and tokenizer fertility (subtokens per word, micros) —
    * the metric that decides whether a tokenizer suits a corpus
    * (fertility ≫ 1 on a language means the model burns context
    * window on fragments).
    *
    * Vocab-first, like the trainer: the corpus shuffles once into
    * DISTINCT words; all merges apply as chained map-side string
    * replaces over the vocab (same [[BpeSep]] greedy-replace
    * semantics as training — encode and train can never disagree on
    * a merge's effect); per-word subtoken counts join back to the
    * token stream on the word. Per-doc output rides one final
    * aggregation; fertility is exact integer micros.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("w0"))
    val base = tok.select("w0").distinct()
      .withColumn("sym", concat_ws(BpeSep,
        filter(split(col("w0"), ""), c => length(c) > 0)))
    val encoded = merges.foldLeft(base) { case (v, (a, b)) =>
      v.withColumn("sym", call_function("replace", col("sym"),
        lit(a + BpeSep + b), lit(a + b)))
    }
    val nsub = encoded.select(col("w0"),
      size(split(col("sym"), BpeSep)).cast("long").as("n_sub"))
    tok.join(nsub, Seq("w0"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subtokens"))
      .withColumn("fertility_micros",
        expr("n_subtokens * 1000000 div n_words"))
  }
}
