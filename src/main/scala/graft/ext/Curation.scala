package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators that rewrite document TEXT (as opposed to
  * selecting whole documents, which is [[Dedup]]/[[Sampling]]'s job):
  * line-level boilerplate dedup, PII redaction, and duplicated-substring
  * span detection. All three are the standard text-cleaning passes of
  * large-scale pretraining pipelines (the C4 line filter, the
  * email/IP/phone masking pass, and exact-substring dedup à la
  * "Deduplicating Training Data Makes Language Models Better").
  *
  * Scale shape, like every graft.ext operator: candidate/count keys are
  * uniform 60-bit md5-derived hashes ([[Text.hash60]]), which spreads
  * DISTINCT keys evenly — but the inputs these operators exist for are
  * precisely the ones with a HOT key (a cookie-banner line or
  * boilerplate shingle occurring in a large fraction of a crawl), and
  * every occurrence of one key hashes to the same value. So corpus-wide
  * occurrence counts are computed with `groupBy(hash)` — partial
  * map-side aggregation collapses a hot key to one row per task before
  * any exchange — and joined back onto the occurrence rows on the same
  * hash key, where AQE's skew-join splitting can subdivide a hot probe
  * partition (a window over the hash could do neither: window
  * partitions cannot pre-aggregate or split). Per-document reassembly
  * shuffles on doc_id; nothing collects to the driver. Results are
  * engine-portable — integer and string ops only — so each operator
  * has an exact DuckDB oracle.
  */
object Curation {

  /** Corpus-level LINE dedup (the C4/RefinedWeb boilerplate filter):
    * drop every line that occurs in at least `minDocs` DISTINCT
    * documents (navigation chrome, cookie banners, licence footers —
    * the text that repeats across a crawl), keep everything else, and
    * reassemble each document with its surviving lines in original
    * order.
    *
    * Plan (the skew-safe formulation — see the object doc): per-line
    * document frequency is `groupBy(lh).agg(count_distinct(doc_id))`,
    * which Spark plans as two partial-aggregating phases — first on
    * the uniform composite (lh, doc_id) key, then on lh over
    * already-collapsed partials — so a line present in 10⁸ documents
    * costs one row per map task, not 10⁸ rows in one partition (the
    * previous window-over-lh formulation had exactly that hot
    * partition, with no way to pre-aggregate). The counts frame (one
    * row per DISTINCT line) joins back onto the occurrence rows on
    * lh; the final regroup on doc_id reassembles. Line identity is
    * the exact line string (hashed to 8-byte keys for the exchange);
    * a line repeated WITHIN one document counts once toward its
    * document frequency, but all its occurrences are dropped together
    * when the line is shared.
    *
    * Output: (doc_id, n_lines, n_kept, clean_text) — clean_text is ""
    * when every line was dropped, and documents always survive (this
    * pass cleans text; whole-document removal is a [[Dedup]] decision).
    */
  def dedupLines(df: DataFrame, content: Column, id: Column,
                 minDocs: Int = 2): DataFrame =
    dedupSegments(df, content, id, minDocs, sep = "\n", nCol = "n_lines")

  /** PARAGRAPH-granularity corpus dedup (the Dolma formulation): same
    * document-frequency drop rule as [[dedupLines]], but the unit of
    * repetition is the blank-line-separated paragraph. Boilerplate that
    * spans several lines (a footer block, a licence notice, a cookie
    * dialog) repeats as a unit across a crawl; line-level dedup would
    * only catch it if every individual line also cleared the threshold,
    * and would shred partially-unique paragraphs. Same skew-safe
    * `groupBy(hash)`+rejoin plan; output
    * (doc_id, n_paras, n_kept, clean_text). */
  def dedupParagraphs(df: DataFrame, content: Column, id: Column,
                      minDocs: Int = 2): DataFrame =
    dedupSegments(df, content, id, minDocs, sep = "\n\n", nCol = "n_paras")

  /** WITHIN-document paragraph dedup — the other half of the Dolma
    * paragraph pass: [[dedupParagraphs]] drops blocks shared ACROSS
    * documents; this drops repeats of a block INSIDE one document
    * (scraper artifacts duplicating a nav block or article body on one
    * page), keeping each distinct paragraph's FIRST occurrence in
    * order. Because the unit of work is one row, this is a pure narrow
    * projection — `filter` with an index lambda against
    * `array_position` (the first-occurrence test), fully inside
    * whole-stage codegen, zero shuffles at any corpus size.
    * Output: (doc_id, n_segs, n_kept, clean_text). */
  def dedupWithinDoc(df: DataFrame, content: Column, id: Column,
                     sep: String = "\n\n"): DataFrame =
    df.select(id.as("doc_id"), split(content, sep).as("__segs"))
      .select(col("doc_id"),
        size(col("__segs")).cast("long").as("n_segs"),
        expr("filter(__segs, (s, i) -> array_position(__segs, s) = " +
          "CAST(i AS BIGINT) + 1)").as("__kept"))
      .select(col("doc_id"), col("n_segs"),
        size(col("__kept")).cast("long").as("n_kept"),
        concat_ws(sep, col("__kept")).as("clean_text"))

  /** Shared segment-dedup core: split on `sep` (kept as a literal-safe
    * regex; both uses are newline runs), count per-segment document
    * frequency with the partial-aggregating groupBy described in
    * [[dedupLines]], drop segments in >= minDocs documents, reassemble
    * with `sep` in original order. Spark's `split` (limit -1) and the
    * oracle's `string_split` both KEEP trailing empty segments, so the
    * reassembly round-trips byte-exactly when nothing is dropped. */
  private def dedupSegments(df: DataFrame, content: Column, id: Column,
                            minDocs: Int, sep: String,
                            nCol: String): DataFrame = {
    val segs = df
      .select(id.as("doc_id"), posexplode(split(content, sep)))
      .toDF("doc_id", "pos", "seg")
      .withColumn("lh", Text.hash60(col("seg")))
    // Not persisted: the lineage is a narrow scan+explode, and at corpus
    // scale re-running it is cheaper than caching the exploded frame.
    val docFreq = segs.groupBy("lh")
      .agg(count_distinct(col("doc_id")).as("nd"))
    segs.join(docFreq, "lh")
      .withColumn("kept", col("nd") < minDocs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as(nCol),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("pos"), col("seg"))))),
            s => s.getField("seg"))).as("clean_text"))
  }

  /** Email / IPv4 / US-phone regexes shared with the DuckDB oracle —
    * deliberately inside the common Java-regex ∩ RE2 dialect (character
    * classes, bounded repetition, `\b`; no lookaround, no backrefs), so
    * both engines match byte-identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII masking pass: replace every email, IPv4, and xxx-xxx-xxxx
    * phone with `<EMAIL>`/`<IP>`/`<PHONE>` tokens and report per-class
    * hit counts. Counts are computed on the ORIGINAL text per class,
    * independently of replacement order; the `<...>` replacements
    * contain no digits or `@` for a later pattern to re-match, so the
    * rewrite is idempotent (property-tested). Caveat on the counts: a
    * pattern can match INSIDE a longer earlier-class match (an
    * IPv4-shaped email local part like `10.2.3.4@x.com` counts one ip
    * whose text the email replacement consumes), so per-class counts
    * are occurrence counts in the original, not a reconciliation
    * against tokens in the redacted output.
    *
    * A NARROW map — per-row regex work, zero shuffles, fully inside
    * whole-stage codegen (built-in `regexp_replace`/`regexp_count`);
    * at 100 TB this runs at scan speed and is the cheapest pass in the
    * file. Output: (doc_id, n_emails, n_ips, n_phones, redacted). */
  def redactPii(df: DataFrame, content: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
      regexp_count(content, lit(EmailRe)).as("n_emails"),
      regexp_count(content, lit(Ipv4Re)).as("n_ips"),
      regexp_count(content, lit(PhoneRe)).as("n_phones"),
      redactText(content).as("redacted"))

  /** The redaction expression alone — a plain Column, so it composes
    * into wider projections and Structured Streaming queries
    * (StreamingCurationSpec dedups a live feed on the redacted text);
    * [[redactPii]] is the canonical batch shape over it. */
  def redactText(content: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(content, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Tracking query parameters stripped by [[canonicalUrl]]: the
    * advertising/analytics click ids and campaign tags that vary per
    * *visit*, not per *page* — the reason one page yields thousands of
    * distinct crawl URLs. */
  private val TrackingParamRe =
    "^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|mc_eid|mc_cid|igshid|ref|ref_src)="

  /** Canonical form of a crawl URL — the dedup KEY for url-level crawl
    * dedup (two fetches of one page under cosmetically different URLs
    * are duplicates before their bytes are even compared):
    *
    *  - scheme dropped (http/https/protocol-relative all collapse);
    *  - userinfo and the #fragment dropped;
    *  - host lowercased, leading `www.`, trailing dot, and default
    *    ports :80/:443 stripped (other ports kept — they address
    *    different servers);
    *  - path: duplicate slashes collapsed, trailing slash stripped
    *    (path CASE is kept — paths are case-sensitive);
    *  - query: split on `&`, empty and tracking params
    *    ([[TrackingParamRe]]) dropped, the survivors SORTED (param
    *    order is transport accident, not identity) and rejoined.
    *
    * A pure zero-shuffle projection — regexp + higher-order array ops
    * only — so it composes into the WARC ingest stream
    * ([[graft.sources.WarcCorpus.webDocuments]] emits `url`) exactly
    * like [[redactText]] composes into curation. */
  def canonicalUrl(url: Column): Column = {
    val noScheme = regexp_replace(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://|^//", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val auth = regexp_extract(noFrag, "^([^/?]*)", 1)
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(lower(regexp_replace(auth, "^[^@]*@", "")),
          "\\.(:[0-9]+)?$", "$1"),   // trailing host dot
        ":(80|443)$", ""),           // default ports
      "^www\\.", "")
    val pathQ = regexp_replace(noFrag, "^[^/?]*", "")
    val path = regexp_replace(
      regexp_replace(regexp_replace(pathQ, "\\?.*$", ""), "/{2,}", "/"),
      "/$", "")
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe)))
    val normQ = array_join(params, "&")
    concat(host, path,
      when(normQ === "", lit("")).otherwise(concat(lit("?"), normQ)))
  }

  /** Unicode normalization as a composable Column — the
    * pre-tokenization pass that makes byte-identical MEANING
    * byte-identical TEXT (composed vs decomposed accents hash, shingle,
    * and dedup apart otherwise); NFKC additionally folds compatibility
    * forms (ligatures, full-width letters, superscripts) the way
    * tokenizer vocabularies expect. A zero-shuffle codegen projection
    * ([[graft.functions.UnicodeNorm]], JDK UAX #15 implementation, with
    * an allocation-free already-normalized fast path), so it composes
    * into streaming ingest like [[redactText]]. Callers must have
    * [[graft.functions.GraftFunctions]] registered. */
  def normalizeText(content: Column, form: String = "NFC"): Column =
    call_function("unicode_norm", content, lit(form))

  /** URL-level crawl dedup over [[canonicalUrl]] — same shape and
    * scale story as [[Dedup.exact]]: one shuffle on the canonical-url
    * md5 (uniform), map-side partial aggregation, keeper = min id. */
  def urlDups(df: DataFrame, url: Column, id: Column): DataFrame =
    df.groupBy(canonicalUrl(url).as("canonical_url"))
      .agg(min(id).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** IMAGE-TEXT PAIR extraction — the multimodal pairing seam of the
    * LAION-style pipelines: pull every `<img>` reference out of a
    * crawled page with its `alt` caption and resolve the `src` against
    * the page URL, producing the (image url, caption) frame that joins
    * the fetched-image corpus (by [[canonicalUrl]]) into
    * (image bytes, caption) training pairs.
    *
    * Resolution covers the four reference forms a crawl actually sees:
    * absolute (`http(s)://…` kept verbatim), protocol-relative
    * (`//host/…` takes the page scheme), root-relative (`/…` takes
    * scheme + host), and path-relative (resolved against the page
    * path's directory; no `..` normalization — [[canonicalUrl]]
    * downstream treats the dot segments as opaque, exactly like the
    * crawler that fetched them). A tag without `src` drops, as does a
    * non-hierarchical scheme (`data:`/`javascript:`/`mailto:` — not
    * fetchable, so not pairable); a missing
    * `alt` is an EMPTY caption, not a dropped pair (caption-free
    * images are the no-alt-text bucket every multimodal curation
    * report prices). `ref_idx` is the tag's index among the page's
    * `<img>` tags (a dropped src-less tag keeps its slot), so the pair
    * order is deterministic and stable under the drop.
    *
    * Attribute handling (the r18 ADVICE trio): the tag regex treats
    * quoted runs atomically, so a literal `>` inside a quoted value
    * (`alt="a > b"`) no longer truncates the tag; attributes are then
    * TOKENIZED left-to-right as whole `name = value` pairs with quoted
    * values consumed atomically — `data-src=`/`data-alt=` lazy-load
    * names are whole-token mismatches (not suffix matches), and a
    * literal `src='…'` inside an earlier attribute's quoted value
    * (`alt="src='evil.png'"`) is swallowed by that attribute's own
    * token, never picked up as the tag's src; unquoted values
    * (`src=photo.jpg` — legal pre-HTML5 markup, common in legacy
    * crawl) match as written. Residual crawl noise, accepted: a tag
    * with an UNBALANCED quote never closes under the atomic-quote tag
    * regex and drops (pre-r19 it matched through the first bare `>`),
    * and an attribute name with characters outside the XML name
    * charset tokenizes at its longest valid suffix.
    *
    * Regexes stay in the shared Java ∩ RE2 dialect ([[urlScope]]'s
    * constraint) so the DuckDB oracle matches byte-identically. A pure
    * zero-shuffle projection + an explode bounded by the page's own
    * tag count — scan-speed at 100 TB, like the other WARC-side
    * passes. Output: (doc_id, ref_idx, img_url, alt). */
  def imageRefs(df: DataFrame, id: Column, html: Column,
                pageUrl: Column): DataFrame = {
    val tags = expr("regexp_extract_all(__h, " +
      "'(?i)<img\\\\b(?:[^>\"\\']|\"[^\"]*\"|\\'[^\\']*\\')*>', 0)")
    val base = df.select(id.as("doc_id"), html.as("__h"),
        pageUrl.as("__u"))
      .select(col("doc_id"), col("__u"),
        posexplode(tags).as(Seq("ref_idx", "__tag")))
      // whole-attribute tokens: XML name charset, then = and a quoted
      // (atomic) or unquoted ([^\s>"']+) value. Left-to-right
      // non-overlapping matching is what makes the quoted-value spoof
      // impossible: the spoofing text sits INSIDE a match already made
      .withColumn("__attrs", expr("regexp_extract_all(__tag, " +
        "'(?i)[a-zA-Z_:][a-zA-Z0-9_:.-]*\\\\s*=\\\\s*" +
        "(?:\"[^\"]*\"|\\'[^\\']*\\'|[^\\\\s>\"\\']+)', 0)"))
    // first token whose NAME is exactly src/alt, value unquoted. The
    // tokenizer guarantees a value starting with a quote ends with the
    // same quote, so the two strips cannot eat value characters.
    // try_element_at: a tag with no such attribute filters to an empty
    // array, which must read as NULL, not an ANSI index error.
    def attrVal(name: String): Column = {
      val tok = expr(
        s"try_element_at(filter(__attrs, a -> a rlike '(?i)^$name\\\\s*='), 1)")
      regexp_replace(
        regexp_replace(
          regexp_replace(tok, s"(?i)^$name\\s*=\\s*", ""),
          "^[\"']", ""),
        "[\"']$", "")
    }
    val src = coalesce(attrVal("src"), lit(""))
    val alt = coalesce(attrVal("alt"), lit(""))
    val scheme = regexp_extract(col("__u"), "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val hostPort = regexp_extract(col("__u"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // directory of the page path, always ending in '/'; a URL with no
    // path component resolves relatives against the root
    val dir = regexp_replace(
      regexp_extract(col("__u"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1),
      "[^/]*$", "")
    base
      .withColumn("__src", src)
      // drop src-less tags AND non-hierarchical schemes (data:,
      // javascript:, mailto: …) — a data: URI is not fetchable, so
      // resolving it path-relative would mint a garbage URL that
      // pollutes the canonicalUrl join against the image corpus
      .where(col("__src") =!= "" &&
        (col("__src").rlike("^[A-Za-z][A-Za-z0-9+.-]*://") ||
          !col("__src").rlike("^[A-Za-z][A-Za-z0-9+.-]*:")))
      .select(col("doc_id"), col("ref_idx").cast("long").as("ref_idx"),
        when(col("__src").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), col("__src"))
          .when(col("__src").startsWith("//"),
            concat(scheme, lit(":"), col("__src")))
          .when(col("__src").startsWith("/"),
            concat(scheme, lit("://"), hostPort, col("__src")))
          .otherwise(concat(scheme, lit("://"), hostPort,
            when(dir === "", lit("/")).otherwise(dir), col("__src")))
          .as("img_url"),
        alt.as("alt"))
  }

  /** (IMAGE, CAPTION) PAIR ASSEMBLY — the step after [[imageRefs]]
    * that the LAION-style recipes publish: the extracted references
    * join the FETCHED image corpus by canonical URL, and the minimal
    * pair gate (a dims floor against the decoded width/height, a
    * caption-length floor against the alt text) drops the
    * placeholder-pixel and no-caption noise before export.
    *
    * `refs` is [[imageRefs]]' output (doc_id, ref_idx, img_url, alt);
    * `images` carries one row per successfully fetched-and-decoded
    * image: (img_url, width, height, mean_luma) — the
    * [[Multimodal.pixelsBatched]] stats keyed by the fetch URL. BOTH
    * sides canonicalize through [[canonicalUrl]] inside the join key
    * (crawl fetch logs store raw URLs; cosmetic variants of one image
    * URL must meet), so a reference pairs iff its image was actually
    * fetched — an unfetched reference drops, the coverage gap every
    * crawl has.
    *
    * The images side aggregates to ONE row per canonical key before
    * the join: a fetch log that holds several raw-URL variants of one
    * image (www/no-www, tracking params) must not duplicate every
    * pair that references it, so variants collapse to the
    * lexicographically-least (width, height, mean_luma) triple — a
    * deterministic keeper, and in practice identical rows since the
    * variants are the same bytes.
    *
    * Scale shape: one hash shuffle per side on the canonical-url key
    * (md5-uniform, skew-free; the images-side partial agg rides the
    * same exchange the join needs) and nothing else — no broadcast
    * assumption, both sides are corpus-sized at 100 TB. Output:
    * (doc_id, ref_idx, canonical_url, caption, width, height,
    * mean_luma). */
  def imagePairs(refs: DataFrame, images: DataFrame,
                 minW: Int, minH: Int, minCaptionChars: Int): DataFrame =
    refs
      .select(col("doc_id"), col("ref_idx"),
        canonicalUrl(col("img_url")).as("canonical_url"),
        col("alt").as("caption"))
      .join(images
        .select(canonicalUrl(col("img_url")).as("canonical_url"),
          col("width"), col("height"), col("mean_luma"))
        .groupBy("canonical_url")
        .agg(min(struct(col("width"), col("height"), col("mean_luma")))
          .as("__s"))
        .select(col("canonical_url"), col("__s.width").as("width"),
          col("__s.height").as("height"),
          col("__s.mean_luma").as("mean_luma")), "canonical_url")
      .where(col("width") >= minW && col("height") >= minH &&
        length(col("caption")) >= minCaptionChars)
      .select(col("doc_id"), col("ref_idx"), col("canonical_url"),
        col("caption"), col("width"), col("height"), col("mean_luma"))

  /** IMAGE-TEXT SIMILARITY gate — the filter that does the real work
    * in the published LAION recipe (LAION-400M/5B: keep a pair only
    * when the CLIP cosine between its image embedding and its caption
    * embedding clears a threshold — 0.28 for LAION-400M; dims and
    * caption floors are pre-filters, this is the semantic gate).
    *
    * `pairs` is [[imagePairs]]' output; `imgEmb` carries one row per
    * embedded fetched image (img_url, embedding: array<float> — the
    * CLIP image tower's output in a real deployment), `txtEmb` one row
    * per embedded caption (caption, embedding — the text tower).
    * The image side canonicalizes through [[canonicalUrl]] inside the
    * join key and collapses raw-URL variants to one deterministic row
    * (minimum quantized vector), mirroring [[imagePairs]]' images-side
    * convention; the caption side collapses duplicate caption rows the
    * same way. A pair whose image or caption has NO stored embedding
    * drops through the inner joins — the embedding-coverage gap,
    * exactly like the fetch-coverage gap upstream.
    *
    * Float discipline is [[Similarity]]'s: embeddings quantize to the
    * 1e-6 integer grid, dot products and squared norms are exact
    * integer sums, and the one rounded double division is the same
    * IEEE sequence in both engines ([[Similarity.cosineQNormed]]).
    * Norms are computed once per VECTOR before the joins, so the
    * per-pair cost is a single dot product. A zero vector has no
    * direction — its cosine is undefined, so the pair drops on an
    * explicit zero-norm guard BEFORE the division: under ANSI (this
    * engine's default) the 0/0 would otherwise raise DIVIDE_BY_ZERO
    * mid-job, and under non-ANSI Spark's Divide yields NULL — a
    * silent drop this guard turns into a documented one.
    *
    * Scale shape: two uniform-hash shuffles and nothing else — the
    * canonical-url join (md5-uniform) and the caption join; both
    * embedding sides partial-agg to one row per key BEFORE their join,
    * and a hot caption (the "stock photo" string shared by millions of
    * pairs) is one build row whose probe side AQE's skew-join split
    * subdivides. No broadcast assumption — at 100 TB the pair frame
    * and both embedding corpora are corpus-sized.
    *
    * Output: the pair columns + `sim` (the rounded cosine), filtered
    * to `sim >= minCosine`. */
  def pairSimilarity(pairs: DataFrame, imgEmb: DataFrame,
                     txtEmb: DataFrame, minCosine: Double): DataFrame = {
    val img = imgEmb
      .select(canonicalUrl(col("img_url")).as("canonical_url"),
        Similarity.quantize(col("embedding")).as("__qi"))
      .groupBy("canonical_url")
      .agg(min(col("__qi")).as("__qi"))
      .withColumn("__ni", Similarity.dotQ(col("__qi"), col("__qi")))
    val txt = txtEmb
      .select(col("caption"),
        Similarity.quantize(col("embedding")).as("__qt"))
      .groupBy("caption")
      .agg(min(col("__qt")).as("__qt"))
      .withColumn("__nt", Similarity.dotQ(col("__qt"), col("__qt")))
    pairs
      .join(img, "canonical_url")
      .join(txt, "caption")
      // the zero-norm guard is load-bearing under ANSI (the default
      // here): Spark's Divide raises DIVIDE_BY_ZERO on a zero
      // divisor, so ONE zero embedding would kill the whole job;
      // non-ANSI it yields NULL (a silent drop). The guard makes the
      // drop explicit either way, like the coverage gaps above
      .where(col("__ni") > 0 && col("__nt") > 0)
      .withColumn("sim", Similarity.cosineQNormed(col("__qi"), col("__qt"),
        col("__ni"), col("__nt")))
      .where(col("sim") >= minCosine)
      .select(col("doc_id"), col("ref_idx"), col("canonical_url"),
        col("caption"), col("width"), col("height"), col("mean_luma"),
        col("sim"))
  }

  /** PAIR-LEVEL dedup for the multimodal corpus — the dedup matrix
    * over [[imagePairs]] output. The dominant duplication mode of
    * crawl-derived pair sets is the SAME image under near-identical
    * captions across pages (syndicated articles, product listings,
    * mirror sites), so the matrix composes the two tiers the text
    * corpus already uses: the NEAR tier is caption-shingle Jaccard
    * ([[Dedup.ngramJaccard]], with the `maxDocFreq` stop-shingle cap —
    * the chat_dd lesson: templated captions make corpus-wide hot
    * shingles the rule, and an uncapped shingle self-join goes
    * quadratic on them), and the EXACT-image tier is canonical-url
    * equality reported per pair-pair as `same_image`. The standard
    * drop rule is `same_image AND jaccard >= minJaccard`; both tiers
    * stay visible so callers can also audit caption-only dups
    * (same text, different image — the watermark/recrop family).
    *
    * Pair identity is the composite (doc_id, ref_idx) — carried as
    * one struct key through the shingle machinery (structs are
    * orderable and hash-joinable), so no synthetic id arithmetic can
    * overflow or alias.
    *
    * Scale shape — why a HOT IMAGE cannot go quadratic here:
    * candidates come ONLY from the capped caption shingles, never
    * from a per-image self-join, so an image referenced by millions
    * of pages with distinct captions contributes zero candidate
    * pairs; the canonical-url flag joins back on the uniform pair-id
    * key AFTER the near tier has already bounded the row set. Same
    * partial-agg + capped-self-join plan as every dedup operator.
    *
    * Output: (doc_a, ref_a, doc_b, ref_b, inter, union_n, jaccard,
    * same_image), ordered pairs under the struct order. */
  def dedupPairs(pairs: DataFrame, k: Int = 3, minJaccard: Double = 0.5,
                 maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val keyed = pairs.select(
      struct(col("doc_id"), col("ref_idx")).as("__pid"),
      col("canonical_url"), col("caption"))
    val near = Dedup.ngramJaccard(keyed, col("caption"), col("__pid"),
      k, minJaccard, maxDocFreq)
    val urls = keyed.select(col("__pid"), col("canonical_url"))
    near
      .join(urls.as("ua"), col("doc_a") === col("ua.__pid"))
      .join(urls.as("ub"), col("doc_b") === col("ub.__pid"))
      .select(
        col("doc_a.doc_id").as("doc_a"),
        col("doc_a.ref_idx").as("ref_a"),
        col("doc_b.doc_id").as("doc_b"),
        col("doc_b.ref_idx").as("ref_b"),
        col("inter"), col("union_n"), col("jaccard"),
        (col("ua.canonical_url") === col("ub.canonical_url"))
          .as("same_image"))
  }

  /** URL-SCOPE compliance filter — the allow/deny pass between crawl
    * ingest and dedup (robots/blocklist/domain-scope policies are
    * expressed over hosts and paths; crawl pipelines apply them per
    * RECORD before any content work so out-of-scope bytes never enter
    * the corpus). Splits [[canonicalUrl]] into host and path and flags
    * each document:
    *
    * `in_scope = (allowHostRe empty | host matches) & !(host matches
    * denyHostRe) & !(path matches denyPathRe)` — an empty allow list
    * admits every host, an empty deny never fires, and matching is
    * UNANCHORED find-anywhere in both engines (anchor with ^$ in the
    * pattern for exact-host policies). Patterns must stay in the shared
    * Java-regex ∩ RE2 dialect ([[EmailRe]]'s constraint) so the DuckDB
    * oracle matches byte-identically.
    *
    * FLAGS, not drops ([[redactPii]]'s convention): the caller filters
    * on `in_scope`, keeps the rejects for a quarantine audit, or joins
    * the flag onto the raw bytes. A pure zero-shuffle codegen
    * projection — at 100 TB this runs at scan speed ahead of every
    * shuffle-bearing pass. Output: (doc_id, canonical_url, host, path,
    * in_scope). */
  def urlScope(df: DataFrame, url: Column, id: Column,
               allowHostRe: String = "", denyHostRe: String = "",
               denyPathRe: String = ""): DataFrame = {
    def denies(c: Column, re: String) =
      if (re.isEmpty) lit(false) else c.rlike(re)
    val allowed =
      if (allowHostRe.isEmpty) lit(true) else col("host").rlike(allowHostRe)
    df.select(id.as("doc_id"), canonicalUrl(url).as("canonical_url"))
      .withColumn("host", regexp_extract(col("canonical_url"), "^([^/?]*)", 1))
      .withColumn("path",
        regexp_extract(col("canonical_url"), "^[^/?]*([^?]*)", 1))
      .withColumn("in_scope",
        allowed && !denies(col("host"), denyHostRe) &&
          !denies(col("path"), denyPathRe))
  }

  /** DOMAIN-LEVEL quality gating (the FineWeb/CCNet convention): page
    * verdicts aggregate per host, and a host whose pass rate or volume
    * falls below the floor is gated WHOLE — crawl pipelines prune at
    * the domain tier before spending per-page work on a spam host's
    * long tail. Input is any (host, ok) page frame (e.g. [[urlScope]]'s
    * host joined with [[c4Clean]]'s page_ok); output one row per host:
    * (host, n_docs, n_ok, ok_pm, domain_ok) with
    * `domain_ok = n_docs >= minDocs AND ok_pm >= minOkPm`.
    *
    * One partial-agg groupBy — hosts are the textbook heavy-hitter key
    * (a big domain is millions of pages), and count/sum combine
    * map-side so the hot host costs one row per task, not a skewed
    * shuffle. */
  def domainStats(df: DataFrame, host: Column, ok: Column,
                  minDocs: Long = 1, minOkPm: Long = 700): DataFrame =
    df.groupBy(host.as("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(ok, 1L).otherwise(0L)).as("n_ok"))
      .withColumn("ok_pm", expr("n_ok * 1000 div n_docs"))
      .withColumn("domain_ok",
        col("n_docs") >= minDocs && col("ok_pm") >= minOkPm)

  /** robots.txt-driven crawl scoping: [[urlScope]]'s projection
    * (canonical_url, host, path) with the verdict column `robots_ok`
    * computed from each host's robots.txt via [[Robots]] — RFC 9309
    * group selection for `agent`, longest-match allow/disallow
    * precedence, `*`/`$` wildcards. `robotsByHost` maps canonical host
    * (lowercase, no trailing dot — [[canonicalUrl]]'s form) to the
    * robots.txt body fetched for it; hosts absent from the map are
    * allowed (no robots file = no restrictions, per spec).
    *
    * The per-host policies compile driver-side into one nested `when`
    * chain (hosts are a config-sized set, rules per host spec-bounded
    * at tens), so the verdict is a pure stateless projection — zero
    * shuffles, whole-stage codegen, streaming-composable — exactly
    * like the regex variant it feeds. */
  def urlScopeRobots(df: DataFrame, url: Column, id: Column,
                     robotsByHost: Map[String, String],
                     agent: String): DataFrame = {
    val policies = robotsByHost.toSeq.sortBy(_._1)
      .map { case (h, txt) => (h, Robots.policyFor(txt, agent)) }
    df.select(id.as("doc_id"), canonicalUrl(url).as("canonical_url"))
      .withColumn("host", regexp_extract(col("canonical_url"), "^([^/?]*)", 1))
      .withColumn("path",
        regexp_extract(col("canonical_url"), "^[^/?]*([^?]*)", 1))
      .withColumn("robots_ok",
        policies.foldRight(lit(true)) { case ((h, rules), acc) =>
          when(col("host") === h,
            Robots.allowsColumn(rules, col("path"))).otherwise(acc)
        })
  }

  /** Duplicated-substring SPANS (exact-substring dedup, Lee et al.):
    * every maximal word range whose every `k`-word window occurs at
    * least `minCount` times corpus-wide (counting repeats within the
    * same document — a self-plagiarized passage is still a duplicate).
    * The canonical use downstream is cutting those spans out of the
    * training text; emitting the spans keeps the operator composable
    * (and lets the row verify exact positions, not just a rewrite).
    *
    * Plan: position-preserving k-shingle explode (narrow), occurrence
    * counts as a partial-aggregating `groupBy(sh)` — a boilerplate
    * shingle in 10⁸ documents collapses map-side instead of flooding
    * one window partition (object doc) — filtered to the
    * over-threshold keys (typically a tiny fraction of the corpus
    * vocabulary, so AQE usually broadcasts the join back and the
    * occurrence side never shuffles for it), then merge overlapping
    * windows per document with a gaps-and-islands pass: shingles at
    * positions p and q (p < q) overlap-or-touch iff q - p <= k, so a
    * window `lag` marks island starts and a running sum numbers them
    * — the only doc-keyed shuffle, bounded per document by text
    * length.
    *
    * Output: (doc_id, span_start, span_end, n_tokens) — inclusive
    * 0-based word positions, n_tokens = span length in words. */
  def duplicateSpans(df: DataFrame, content: Column, id: Column,
                     k: Int = 5, minCount: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = df.select(id.as("doc_id"), posexplode(Text.shingles(content, k)))
      .toDF("doc_id", "pos", "s")
      .select(col("doc_id"), col("pos"), Text.hash60(col("s")).as("sh"))
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .select("sh")
    sh.join(hot, "sh")
      .select("doc_id", "pos")
      .withColumn("newi",
        when(col("pos") - lag("pos", 1).over(w) > k, 1).otherwise(0))
      .withColumn("island", sum("newi").over(w))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("n_tokens"))
  }

  /** All MAXIMAL exact duplicated word runs of length ≥ `k` between
    * document pairs — the LONGEST-match semantics of exact-substring
    * dedup (Lee et al.'s ExactSubstr finds maximal repeated substrings
    * with a suffix array; [[duplicateSpans]] only merges over-threshold
    * windows, which can fuse runs duplicated against DIFFERENT partners
    * into one span). Re-expressed for a distributed engine as DIAGONAL
    * SEED-CHAINING (the seed-and-extend idiom of genome aligners, which
    * face the same problem at the same scale): two k-shingle windows at
    * positions pA in doc A and pB in doc B match with alignment
    * `diag = pB - pA`; a maximal run of CONSECUTIVE matching windows
    * along one (A, B, diag) is exactly a maximal matching substring of
    * length `run + k - 1` words — every window inside a true match
    * matches, and a window just past either end doesn't, so chaining
    * k-seeds loses nothing and adds nothing (no heuristic, unlike the
    * island merge).
    *
    * Plan: positioned shingles (narrow), occurrence counts by
    * partial-agg `groupBy(sh)` kept to `2 ≤ n ≤ maxOccur` — n < 2
    * cannot match, and `maxOccur` is the stop-shingle cap bounding the
    * self-join's fan-out at n² per shingle (the [[Dedup]] `maxBucket`
    * recall trade: a boilerplate shingle in 10⁸ documents would
    * otherwise emit 10¹⁶ pairs; capped shingles are skipped and
    * documented as such). The self-join shuffles on the uniform shingle
    * hash sized by the DUPLICATE set, then one window keyed by
    * (doc_a, doc_b, diag) — bounded per pair by text length — chains
    * runs. Nothing touches the driver.
    *
    * Output: (doc_a, doc_b, a_start, b_start, len_words), ordered pairs
    * (doc_a < doc_b, or doc_a = doc_b with a_start < b_start — a
    * self-plagiarized passage is a pair with itself), one row per
    * maximal run. */
  def maximalMatches(df: DataFrame, content: Column, id: Column,
                     k: Int = 5, maxOccur: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sh = df.select(id.as("doc_id"), posexplode(Text.shingles(content, k)))
      .toDF("doc_id", "pos", "s")
      .select(col("doc_id"), col("pos"), Text.hash60(col("s")).as("sh"))
    val dup = sh.groupBy("sh").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2 && col("n") <= maxOccur)
      .select("sh")
    val seeds = sh.join(dup, "sh")
    val a = seeds.select(col("sh"), col("doc_id").as("doc_a"),
      col("pos").as("pos_a"))
    val b = seeds.select(col("sh"), col("doc_id").as("doc_b"),
      col("pos").as("pos_b"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    a.join(b, Seq("sh"))
      .where(col("doc_a") < col("doc_b") ||
        (col("doc_a") === col("doc_b") && col("pos_a") < col("pos_b")))
      .withColumn("diag", col("pos_b") - col("pos_a"))
      .withColumn("newi",
        when(col("pos_a") - lag("pos_a", 1).over(w) > 1, 1).otherwise(0))
      .withColumn("isl", sum("newi").over(w))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg(min("pos_a").as("a_start"), max(col("pos_a")).as("__m"))
      .select(col("doc_a"), col("doc_b"),
        col("a_start").cast("int").as("a_start"),
        (col("a_start") + col("diag")).cast("int").as("b_start"),
        (col("__m") - col("a_start") + lit(k)).cast("int").as("len_words"))
  }

  /** Per-document LONGEST duplicated run — [[maximalMatches]] folded to
    * the per-doc answer the curation report wants ("what is this doc's
    * worst duplication?"): both sides of every pair contribute, the
    * winner is longest first, then smallest start (ties beyond that are
    * value-identical rows, so the pick is deterministic). One union +
    * one per-doc top-1 window (WindowGroupLimit keeps a 1-row buffer
    * per task). Documents with no duplicated run ≥ k emit nothing.
    * Output: (doc_id, span_start, len_words). */
  def longestDuplicatePerDoc(df: DataFrame, content: Column, id: Column,
                             k: Int = 5, maxOccur: Int = 256): DataFrame = {
    val m = maximalMatches(df, content, id, k, maxOccur)
    val sides = m.select(col("doc_a").as("doc_id"),
        col("a_start").as("span_start"), col("len_words"))
      .unionAll(m.select(col("doc_b").as("doc_id"),
        col("b_start").as("span_start"), col("len_words")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("len_words").desc, col("span_start").asc)
    sides.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** The REWRITE companion to [[duplicateSpans]] — exact-substring
    * dedup's endpoint: cut every duplicated span out of the text and
    * return what survives (Lee et al. remove one-side duplicated text
    * before training; this removes all sides, the conservative variant
    * that needs no global keeper election).
    *
    * The spans are already merged and disjoint, so expanding them to
    * covered word positions needs no dedup — an `explode(sequence)`
    * bounded by total span length, joined to the word explode on
    * uniform (doc_id, position) keys, then one doc-keyed regroup to
    * reassemble. Every document survives (possibly with empty text),
    * mirroring [[dedupLines]].
    *
    * Output: (doc_id, n_words, n_cut, clean_text). */
  /** Sliding-window document CHUNKING — the long-document →
    * context-window splitter between curation and tokenize/pack (and
    * the chunker RAG ingestion runs): windows of `sizeWords` words
    * starting every `strideWords` (stride < size ⇒ overlap, the
    * standard boundary-context hedge), the last window short if the
    * document doesn't divide. Chunk count is closed-form
    * `1 + ceil(max(0, n - size) / stride)` — a document at or under
    * one window emits exactly one chunk; empty documents emit none
    * (the quarantine-free drop, callers union them back if an empty
    * chunk row is wanted).
    *
    * Scale shape: a pure narrow projection — `transform(sequence(...))`
    * + `posexplode`, no shuffle, no join, bounded fan-out n/stride per
    * document; the arithmetic is all integer so the DuckDB oracle
    * (`chunks`) reproduces it exactly.
    *
    * Output: (doc_id, chunk_idx, chunk_text, n_words). */
  def chunkByWords(df: DataFrame, content: Column, id: Column,
                   sizeWords: Int, strideWords: Int): DataFrame = {
    require(sizeWords > 0 && strideWords > 0 && strideWords <= sizeWords,
      s"need 0 < stride <= size, got size=$sizeWords stride=$strideWords")
    df.where(length(trim(content)) > 0)
      .select(id.as("doc_id"), Text.words(content).as("__w"))
      .withColumn("__n", size(col("__w")))
      .withColumn("__nc",
        lit(1) + expr(s"(greatest(__n - $sizeWords, 0) + $strideWords - 1) div $strideWords"))
      .select(col("doc_id"), col("__n"),
        posexplode(expr(
          s"transform(sequence(0, __nc - 1), i -> array_join(slice(__w, i * $strideWords + 1, $sizeWords), ' '))")))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        col("col").as("chunk_text"),
        least(lit(sizeWords),
          col("__n") - col("pos") * strideWords).cast("int").as("n_words"))
  }

  /** Word-level sentence-terminal characters shared with the DuckDB
    * oracle: the Latin `.` `!` `?` plus the CJK fullwidth 。！？, the
    * Arabic question mark ؟ and full stop ۔, and the Devanagari danda
    * । / double danda ॥ — the full-stop forms of the bulk-of-web
    * scripts [[graft.ext.TextAnalysis.scriptProfile]] censuses (Latin
    * punctuation covers Cyrillic/Greek; Han/Kana share 。). A plain
    * single-codepoint char list, no lookbehind — every entry works as
    * a word-level `right(w, 1) IN (…)` rule in BOTH engines. */
  val SentenceTerminals: Seq[String] =
    Seq(".", "!", "?", "。", "！", "？", "؟", "۔", "।", "॥")

  /** SENTENCE-AWARE chunking — [[chunkByWords]]'s sibling for the
    * public long-document recipe: never split mid-sentence. The word
    * grid is the same (`sizeWords`-word windows every `strideWords`),
    * but a SENTENCE joins every window its first word falls in, whole —
    * so chunks align to sentence boundaries, overlap is inherited from
    * the grid, and a chunk can run past `sizeWords` when a sentence
    * straddles its right edge (the defining trade of sentence-aware
    * chunking). A window that no sentence STARTS in emits no chunk, so
    * `chunk_idx` is sparse around sentences longer than the window —
    * callers treat chunk_idx as a grid position, not a dense rank.
    *
    * Sentence boundaries are word-level and dialect-free (both engines
    * agree without lookbehind, which RE2 lacks): a sentence ends at
    * every word whose last character is in [[SentenceTerminals]] —
    * the Latin `.`/`!`/`?` plus the CJK, Arabic and Devanagari
    * full-stop forms, so a CJK or Hindi corpus chunks at its real
    * sentence ends instead of one giant "sentence" that silently
    * swallows every window — and at the document's final word. An
    * abbreviation like "etc." therefore cuts — the standard
    * cheap-segmenter approximation; swap the boundary predicate for a
    * model segmenter upstream if that matters.
    *
    * Scale shape: like [[chunkByWords]] a pure narrow projection —
    * boundary positions, per-sentence offsets and window assignment
    * all live in the array world (HOFs in whole-stage codegen), one
    * explode at the end, no shuffle, no join; per-document work is
    * O(sentences · windows), the overlap-factor-bounded fan-out.
    *
    * Output: (doc_id, chunk_idx, chunk_text, n_sents, n_words). */
  def chunkBySentences(df: DataFrame, content: Column, id: Column,
                       sizeWords: Int, strideWords: Int): DataFrame = {
    val terms = SentenceTerminals.map(t => s"'$t'").mkString(", ")
    require(sizeWords > 0 && strideWords > 0 && strideWords <= sizeWords,
      s"need 0 < stride <= size, got size=$sizeWords stride=$strideWords")
    // Plan-size fence between the HOF layers (QueryApi.parseOnce's
    // documented always-true nondeterministic guard): the sentence
    // layer references __bp six times and the window layer references
    // __s twice, so with plain Projects CollapseProject would inline
    // the whole chain into ONE expression whose size multiplies per
    // layer — on a caller that stacks another synthesis transform
    // under `content`, analysis+optimization of that mega-tree spun
    // for MINUTES (caught live in r17 on the cks (née chnk_s) row). The fence
    // keeps each layer its own Project: the array materializes once
    // per row — which is also the cheaper execution — and the
    // always-true branch changes no value, under any partitioning.
    def fence(c: Column): Column =
      when(monotonically_increasing_id() >= -1, c)
    df.where(length(trim(content)) > 0)
      .select(id.as("doc_id"), Text.words(content).as("__w"))
      .withColumn("__n", size(col("__w")))
      // 1-based sentence END positions: terminal-punctuation words
      // plus the final word
      .withColumn("__bp", fence(expr(
        "filter(sequence(1, __n), i -> i = __n OR " +
          s"right(element_at(__w, i), 1) IN ($terms))")))
      // per-sentence struct: 0-based start offset o, word count c,
      // text t (start = previous end + 1)
      .withColumn("__s", fence(expr(
        "transform(sequence(0, size(__bp) - 1), k -> named_struct(" +
          "'o', CAST(CASE WHEN k = 0 THEN 0 ELSE element_at(__bp, k) END AS INT), " +
          "'c', CAST(element_at(__bp, k + 1) - " +
          "(CASE WHEN k = 0 THEN 0 ELSE element_at(__bp, k) END) AS INT), " +
          "'t', array_join(slice(__w, " +
          "(CASE WHEN k = 0 THEN 0 ELSE element_at(__bp, k) END) + 1, " +
          "element_at(__bp, k + 1) - " +
          "(CASE WHEN k = 0 THEN 0 ELSE element_at(__bp, k) END)), ' ')))")))
      // grid windows up to the last sentence start; keep only windows
      // some sentence starts in
      .withColumn("__ch", expr(
        s"filter(transform(sequence(0, element_at(__s, -1).o div $strideWords), " +
          s"i -> named_struct('ci', i, 'ss', filter(__s, s -> " +
          s"i * $strideWords <= s.o AND s.o < i * $strideWords + $sizeWords))), " +
          "c -> size(c.ss) > 0)"))
      .select(col("doc_id"), explode(col("__ch")).as("__c"))
      .select(col("doc_id"), col("__c.ci").cast("int").as("chunk_idx"),
        expr("array_join(transform(__c.ss, s -> s.t), ' ')").as("chunk_text"),
        expr("CAST(size(__c.ss) AS INT)").as("n_sents"),
        expr("CAST(aggregate(__c.ss, 0, (a, s) -> a + s.c) AS INT)")
          .as("n_words"))
  }

  /** Credential-shaped token regexes shared with the DuckDB oracle —
    * the detect-secrets / gitleaks pattern families every corpus
    * release scans for, kept inside the Java-regex ∩ RE2 dialect
    * (inline `(?i)`, classes, bounded repetition; no lookaround). */
  val AwsKeyRe = "AKIA[0-9A-Z]{16}"
  val PemRe = "-----BEGIN [A-Z ]{0,20}PRIVATE KEY-----"
  val GithubTokenRe = "ghp_[A-Za-z0-9]{36}"
  val SlackTokenRe = "xox[baprs]-[A-Za-z0-9-]{10,48}"
  val KvSecretRe =
    "(?i)(password|passwd|secret|api_key|apikey|token)(\\s*[=:]\\s*)[^\\s]{6,}"

  /** Secret/credential scan — the pre-release pass between PII
    * masking and publication (training corpora MEMORIZE leaked keys;
    * every public pipeline scrubs them): per-class occurrence counts
    * for AWS access-key ids, PEM private-key headers, GitHub personal
    * access tokens, Slack tokens, and `password=...`-style
    * assignments, a `has_secret` verdict, and the scrubbed text with
    * each hit replaced by `<SECRET>` (key-value hits keep their key
    * and separator, so the scrub is a FIXED POINT: re-running replaces
    * `<SECRET>` with itself). Counts are measured on the ORIGINAL
    * text, like [[redactPii]]. A NARROW zero-shuffle regexp map —
    * scan speed at 100 TB.
    *
    * Output: (doc_id, n_aws, n_pem, n_github, n_slack, n_kv,
    * has_secret, scrubbed). */
  /** The scrub chain as a composable Column (the [[redactText]]
    * pattern), so a streaming projection can scrub without
    * re-stating the five families and their fixed-point ordering. */
  def scrubSecrets(content: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(content, lit(AwsKeyRe), lit("<SECRET>")),
            lit(PemRe), lit("<SECRET>")),
          lit(GithubTokenRe), lit("<SECRET>")),
        lit(SlackTokenRe), lit("<SECRET>")),
      lit(KvSecretRe), lit("$1$2<SECRET>"))

  def flagSecrets(df: DataFrame, content: Column, id: Column): DataFrame = {
    val scrub = scrubSecrets(content)
    df.select(id.as("doc_id"),
        regexp_count(content, lit(AwsKeyRe)).as("n_aws"),
        regexp_count(content, lit(PemRe)).as("n_pem"),
        regexp_count(content, lit(GithubTokenRe)).as("n_github"),
        regexp_count(content, lit(SlackTokenRe)).as("n_slack"),
        regexp_count(content, lit(KvSecretRe)).as("n_kv"),
        scrub.as("scrubbed"))
      .withColumn("has_secret",
        expr("n_aws + n_pem + n_github + n_slack + n_kv > 0"))
      .select("doc_id", "n_aws", "n_pem", "n_github", "n_slack", "n_kv",
        "has_secret", "scrubbed")
  }

  /** The C4 page-cleaning pass (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", §2.2): keep only lines that end in a terminal
    * punctuation mark (`.` `!` `?` `"`), carry at least `minWords`
    * whitespace words, and don't mention "javascript"
    * (case-insensitive); drop the ENTIRE page — clean_text becomes ""
    * — when it contains "lorem ipsum" or a curly bracket `{` anywhere
    * (C4's placeholder/code tells). Line and page verdicts are both
    * reported so callers can audit what a drop cost.
    *
    * A pure NARROW projection — one `split` + one `filter` HOF per
    * row, zero shuffles (unlike [[dedupLines]], no corpus-wide count
    * is needed: every rule is local to the page), scan speed at
    * 100 TB.
    *
    * Output: (doc_id, n_lines, n_kept, page_ok, clean_text) —
    * `n_kept` counts rule-surviving lines even on dropped pages
    * (page_ok=false), where clean_text is "". */
  def c4Clean(df: DataFrame, content: Column, id: Column,
              minWords: Int = 5): DataFrame = {
    // one native pass ([[graft.functions.C4Profile]]) — the HOF
    // formulation split + filtered + re-joined through interpreted
    // lambdas and lowercased every line twice; semantics pinned equal
    // by the hostile-page equivalence spec, oracle unchanged
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(id.as("doc_id"),
        call_function("c4_profile", content, lit(minWords)).as("__c"))
      .select(col("doc_id"), col("__c.n_lines").as("n_lines"),
        col("__c.n_kept").as("n_kept"), col("__c.page_ok").as("page_ok"),
        // coalesce: a NULL page null-propagates through the struct,
        // but the contract (and the HOF formulation's otherwise(""))
        // guarantees clean_text is never null
        coalesce(col("__c.clean_text"), lit("")).as("clean_text"))
  }

  def cutSpans(df: DataFrame, content: Column, id: Column,
               k: Int = 5, minCount: Int = 2): DataFrame = {
    val covered = duplicateSpans(df, content, id, k, minCount)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("wpos"),
        lit(true).as("cut"))
    df.select(id.as("doc_id"), posexplode(Text.words(content)))
      .toDF("doc_id", "wpos", "w")
      .join(covered, Seq("doc_id", "wpos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cut"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("cut").isNull,
              struct(col("wpos"), col("w"))))),
            s => s.getField("w"))).as("clean_text"))
  }
}
