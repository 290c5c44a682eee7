package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, word shingles, a portable 60-bit content hash, language
  * ID scoring, quality ratios, and token counting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions, regexp) — no Scala UDFs in the hot
  * path, so whole-stage codegen spans the full pipeline.
  *
  * The hash is md5-based (not Spark's xxhash64) so that any engine can
  * reproduce it — the DuckDB oracle computes the identical value with
  * `('0x'||substr(md5(x),1,15))::BIGINT`.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Word n-gram shingles: ["a","b","c","d"] with n=3 →
    * ["a b c", "b c d"]. Empty array when fewer than n tokens
    * (guarded: Spark's `sequence(1, k)` counts DOWN when k < 1).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Portable 60-bit positive hash: first 15 hex nibbles of md5.
    * Oracle equivalent: `('0x'||substr(md5(x),1,15))::BIGINT`.
    * Native codegen'd expression (graft.functions.Hash60) — the
    * composable `conv(substring(md5(c),1,15),16,10)` form produces the
    * same value but pays two string materializations per call.
    */
  def hash60(c: Column): Column = graft.functions.Hash60.hash60(c)

  /** Composable reference formulation (kept for the equivalence spec). */
  private[graft] def hash60Composable(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  def hash60Sql(x: String): String = s"('0x'||substr(md5($x),1,15))::BIGINT"

  /** Seeded variant for minhash families: hash of "<seed>:<value>". */
  def seededHash60(seed: Column, c: Column): Column =
    hash60(concat(seed.cast(StringType), lit(":"), c))
  def seededHash60Sql(seed: String, x: String): String =
    hash60Sql(s"CAST($seed AS VARCHAR)||':'||$x")

  /** Count of tokens belonging to a marker set, with multiplicity
    * (language-ID signal). Computed as Σ_m (n − |array_remove(toks, m)|):
    * `array_remove` is a regular codegen'd expression, whereas the
    * natural `size(filter(...))` is a CodegenFallback higher-order
    * function — interpreted per row in the hottest text-analysis loop.
    */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    markers.map(m => size(toks) - size(array_remove(toks, m)))
      .reduce(_ + _)

  /** Higher-order-function formulation — kept for the equivalence spec. */
  private[graft] def markerCountHof(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  /** BPE-ish subword tokenizer regex: letter runs, single digits,
    * single punctuation marks. Shared verbatim with the oracle (RE2 and
    * Java regex agree on this subset).
    */
  val BpePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  // ---- Normalization --------------------------------------------------

  /** Canonical text normalization before hashing/dedup: Unicode NFC
    * (composed forms — decomposed "e"+U+0301 and precomposed "é" are
    * different bytes but the same text, so un-normalized dedup misses
    * them), lowercase, whitespace collapsed to single spaces, trimmed.
    * Oracle: `trim(regexp_replace(lower(nfc_normalize(x)), '\s+', ' ', 'g'))`.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(graft.functions.NormalizeNFC.nfc(c)), "\\s+", " "))

  def normalizeTextSql(x: String): String =
    s"trim(regexp_replace(lower(nfc_normalize($x)), '\\s+', ' ', 'g'))"

  // ---- PII-style redaction -------------------------------------------
  // Patterns stay inside the RE2 ∩ Java-regex common subset (character
  // classes, bounded repetition, \b ASCII word boundaries — no
  // backreferences or lookaround) so the DuckDB oracle's regexp_replace
  // computes the byte-identical result.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongNumPattern = "\\b[0-9]{9,}\\b"

  /** Redact emails, IPv4 addresses, and long (9+) digit runs — the
    * standard pre-training scrub pass. Order matters: emails first
    * (their local part may contain digit runs), then IPs (dotted quads
    * must not be eaten as four short numbers), then bare digit runs.
    * Three codegen'd regexp_replace calls, map-side only.
    */
  /** Canonical URL for crawl-scale dedup — the standard normalization
    * chain, every step a codegen'd built-in (regexp/string/higher-order
    * array functions; no UDF): lowercase scheme+authority, strip a
    * leading `www.`, strip the scheme's default port (:80 http /
    * :443 https), drop the fragment, trim trailing slashes (root stays
    * `/`), drop `utm_*` tracking params, and SORT the surviving query
    * params so param order can't split a duplicate. Two fetches of the
    * same page that differ only in case/port/fragment/tracking/param
    * order map to one key; `groupBy(canonicalUrl)` is then exact URL
    * dedup with all the scale properties of [[Dedup.exactGroups]].
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = regexp_replace(
      lower(regexp_extract(noFrag, "^[^:]+://([^/?#]*)", 1)), "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = regexp_replace(
      regexp_extract(noFrag, "^[^:]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = array_join(array_sort(filter(split(
        regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && substring(p, 1, 4) =!= "utm_")), "&")
    concat(scheme, lit("://"), auth, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** DuckDB replay of [[canonicalUrl]] — same regex/array algebra. */
  def canonicalUrlSql(x: String): String = {
    val nf = s"regexp_replace($x, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    val auth0 = s"regexp_replace(lower(regexp_extract($nf, '^[^:]+://([^/?#]*)', 1)), '^www\\.', '')"
    val auth = s"""CASE WHEN $scheme = 'http' THEN regexp_replace($auth0, ':80$$', '')
                  |     WHEN $scheme = 'https' THEN regexp_replace($auth0, ':443$$', '')
                  |     ELSE $auth0 END""".stripMargin
    val path0 = s"regexp_replace(regexp_extract($nf, '^[^:]+://[^/?#]*([^?#]*)', 1), '/+$$', '')"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    // Double COALESCE: DuckDB regexp_extract is NULL on no match where
    // Spark's returns '', and DuckDB array_to_string([]) is NULL where
    // Spark's array_join([]) is '' — a query-less or utm-only URL must
    // not go NULL end-to-end.
    val q = s"""COALESCE(array_to_string(list_sort(list_filter(string_split(
               |  COALESCE(regexp_extract($nf, '\\?([^#]*)', 1), ''), '&'),
               |  p -> p <> '' AND substr(p, 1, 4) <> 'utm_')), '&'), '')""".stripMargin
    s"""($scheme || '://' || $auth || $path ||
       | CASE WHEN $q = '' THEN '' ELSE '?' || $q END)""".stripMargin
  }

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      LongNumPattern, "<NUM>")

  // DuckDB string literals keep backslashes verbatim — patterns embed
  // exactly as the JVM regex sees them.
  def redactSql(x: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($x,
       |    '$EmailPattern', '<EMAIL>', 'g'),
       |    '$Ipv4Pattern', '<IP>', 'g'),
       |    '$LongNumPattern', '<NUM>', 'g')""".stripMargin

  /** Default stopword list of the Gopher word gate — shared by the
    * standalone gate query (q_t12) and the composed pipeline (q_t33)
    * so the two can never drift.
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The word-level half of the Gopher curation rules (public: Rae et
    * al. [Gopher] §A1.1): word-count bounds, mean word length in
    * [3, 10], alphabetic-word ratio ≥ 0.7, ≥ 2 stopword hits. One
    * map-side pass over the scan — every signal is a higher-order-
    * function fold over the token array, no explode, no shuffle.
    * Ratios are floor(×100) integers so the gate booleans compare
    * exactly across engines. Output: (id, n_words, mwl100, ar100,
    * stop_hits, pass).
    */
  def gopherWordGate(docs: DataFrame, idCol: String, textCol: String,
                     stops: Seq[String] = gopherStops): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_words", size(col("toks")))
      .withColumn("mwl100",
        floor(aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x) * 100.0 / col("n_words")).cast("long"))
      .withColumn("ar100",
        floor(size(filter(col("toks"), t => t.rlike("[A-Za-z]"))) * 100.0
          / col("n_words")).cast("long"))
      .withColumn("stop_hits", markerCount(col("toks"), stops))
      .withColumn("pass",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mwl100") >= 300 && col("mwl100") <= 1000 &&
          col("ar100") >= 70 && col("stop_hits") >= 2)
      .select(col(idCol), col("n_words"), col("mwl100"), col("ar100"),
        col("stop_hits"), col("pass"))

  /** Category-BLOCKLIST safety gate — the lexicon-based content filter
    * every curation pipeline runs before anything learned: per
    * (document, category) hit counts against a categorized term list,
    * with the category tripped at `threshold` hits (one incidental
    * token ≠ a topical document — the threshold is the contract, not
    * an implementation detail). The lexicon is bounded by construction
    * (it's authored) → broadcast; counts map-side combine; docs with
    * zero hits never materialize.
    *
    * Output: one row per (id, cat) with ≥1 hit — (id, cat, n_hits,
    * cat_blocked).
    */
  def blocklistGate(docs: DataFrame, idCol: String, textCol: String,
                    lexicon: Map[String, Seq[String]],
                    threshold: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = lexicon.toSeq
      .flatMap { case (cat, ts) => ts.map(t => (cat, t.toLowerCase)) }
      .toDF("cat", "term")
    docs.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit("[A-Za-z]+"), lit(0))).as("tok"))
      .select(col(idCol), lower(col("tok")).as("term"))
      .join(broadcast(lex), "term")
      .groupBy(col(idCol), col("cat"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("cat_blocked", col("n_hits") >= threshold)
  }

  /** BM25 ranked retrieval over the corpus — the step past TF-IDF
    * (q_t11) that adds document-length normalization and tf
    * saturation, i.e. the default ranking function of every full-text
    * engine. Integer-exact LOG-FREE surrogate (the q_t18 PMI move):
    * with k1 = 1.2, b = 0.75 cleared to integers,
    *
    *   idf1e6(t)   = (2·(N − df) + 1)·1e6 div (2·df + 1)
    *                 — the Robertson odds ratio ×1e6, ln omitted (ln is
    *                   monotone, so per-term ordering is preserved; the
    *                   multi-term sum weighs rare terms MORE than true
    *                   BM25 — a stated contract, not an approximation
    *                   drifting with libm)
    *   tf-part     = 22·tf·avgdl / (10·avgdl·tf + 3·avgdl + 9·dl)
    *                 — exactly tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *                   with both sides ×10·avgdl, so it stays integral
    *   score(d)    = Σ_t idf1e6·22·tf·avgdl div (10·avgdl·tf + 3·avgdl + 9·dl)
    *
    * Long-safe while idf1e6·22·tf·avgdl < 2^63 — i.e. N·tf·avgdl below
    * ~4·10^11; past that, drop the 1e6 scale or move the product to
    * DECIMAL(38,0).
    *
    * Shape: tf/dl/df are map-side-combined counts; the query-term df
    * table is bounded by the QUERY (broadcast); corpus-size scalars
    * ride a 1-row broadcast; the final top-k is a k-bounded
    * TakeOrdered. Docs containing no query term never materialize.
    */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("[A-Za-z]+"), lit(0))).as("tok"))
      .select(col("id"), lower(col("tok")).as("term"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val scal = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    val q = toks.filter(col("term").isin(queryTerms: _*))
    val dfreq = q.select(col("id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    q.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(broadcast(dfreq), "term")
      .join(dl, "id")
      .crossJoin(broadcast(scal))
      .withColumn("contrib", expr(
        """((2 * (n_docs - df) + 1) * 1000000 div (2 * df + 1))
          |  * 22 * tf * avgdl
          |  div (10 * avgdl * tf + 3 * avgdl + 9 * dl)""".stripMargin))
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
