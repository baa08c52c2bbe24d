package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. Everything is keyed on `hash60(md5(id))` rather than a
  * random number generator, so results are
  *
  *  - reproducible across runs, partitionings, and engines (the DuckDB
  *    oracle computes the identical membership);
  *  - stable under retries and incremental reprocessing — a document's
  *    split assignment never changes when the corpus around it does,
  *    which is the property that keeps train/test contamination out of
  *    incremental pipelines;
  *  - narrow: every operator is a per-row filter/projection, no shuffle.
  */
object Sampling {

  /** Uniform pseudo-random unit value in [0, 1_000_000) per id. */
  private def ppmOf(id: Column): Column =
    Text.hash60(id.cast("string")) % 1000000L

  /** Deterministic sample: keeps a row iff its id hashes under `ppm`
    * parts-per-million (ppm=10_000 ≈ 1%). */
  def sampleByHash(df: DataFrame, id: Column, ppm: Int): DataFrame =
    df.where(ppmOf(id) < ppm)

  /** Train/validation/test split by hash bucket: adds a `split` column
    * ("train" / "val" / "test") with the given ppm budgets for val and
    * test (the rest is train). Assignment depends only on the id. */
  def split(df: DataFrame, id: Column,
            valPpm: Int = 50000, testPpm: Int = 50000): DataFrame = {
    val u = ppmOf(id)
    df.withColumn("split",
      when(u < valPpm, "val")
        .when(u < valPpm + testPpm, "test")
        .otherwise("train"))
  }

  /** Stratified deterministic sample: per-stratum keep rates in ppm
    * (strata absent from the map are dropped — the common "cap the
    * over-represented classes" shape). */
  def stratified(df: DataFrame, stratum: Column, id: Column,
                 ratesPpm: Map[String, Int]): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(stratum === k, v).otherwise(acc)
    }
    df.where(ppmOf(id) < rate)
  }

  /** SCORE-WEIGHTED deterministic sample — keep probability
    * proportional to a per-document quality score (the
    * "sample-by-quality" step between scoring and mixture: keep the
    * best content at a higher rate without a hard threshold's cliff).
    * `scorePpm` is the per-row keep rate in parts-per-million, clamped
    * to [0, 1e6] — callers derive it from any integer scoring
    * ([[TextAnalysis.qualityScore]] terms, length buckets, …), keeping
    * the arithmetic engine-portable. Same determinism contract as
    * [[sampleByHash]]: membership is a pure function of (seed, id,
    * score), a narrow zero-shuffle filter, re-drawable with a new
    * seed, and stable under corpus growth. */
  def weighted(df: DataFrame, id: Column, scorePpm: Column,
               seed: String = "wt0"): DataFrame = {
    val rate = least(greatest(scorePpm.cast("long"), lit(0L)), lit(1000000L))
    df.where(Text.hash60(concat_ws(":", lit(seed), id.cast("string")))
      % 1000000L < rate)
  }

  /** UPSAMPLING / multi-epoch repetition — the other half of mixture
    * recipes that [[sampleByHash]]-style thinning can't express: a
    * published mix repeats its highest-quality domains MORE than once
    * per epoch (e.g. Wikipedia at 2.5 epochs), so `ratePpm` here may
    * exceed 1e6. A row emits `rate div 1e6` whole copies plus one more
    * iff its seeded hash lands under `rate % 1e6` — the corpus-level
    * expectation is exactly rate/1e6 epochs, decided per document, no
    * RNG. `copy_idx` (0-based) distinguishes the copies so downstream
    * shuffling/packing can spread them across the training order
    * instead of training on back-to-back duplicates. Rates ≤ 1e6
    * degenerate to [[weighted]]'s keep/drop (0 or 1 copy). Narrow
    * zero-shuffle explode with fan-out rate/1e6 per row; deterministic,
    * re-drawable by seed, stable under corpus growth. */
  def repeatByRate(df: DataFrame, id: Column, ratePpm: Column,
                   seed: String = "rep0"): DataFrame = {
    // contract: the output column and the internal scratch names must
    // not collide with input columns — a pre-existing copy_idx would
    // yield an ambiguous duplicate, and a pre-existing __rate/__copies
    // would be silently clobbered by the withColumns below. Rename
    // before chaining a second repetition stage.
    Seq("copy_idx", "__rate", "__copies").foreach(c =>
      require(!df.columns.contains(c),
        s"repeatByRate reserves column name '$c'; rename it in the input"))
    val inCols = df.columns.map(col).toSeq
    df.withColumn("__rate", greatest(ratePpm.cast("long"), lit(0L)))
      .withColumn("__copies",
        expr("__rate div 1000000L") +
          when(Text.hash60(concat_ws(":", lit(seed), id.cast("string")))
            % 1000000L < col("__rate") % 1000000L, 1L).otherwise(0L))
      .where(col("__copies") > 0)
      .select(inCols :+
        explode(sequence(lit(0L), col("__copies") - 1)).as("copy_idx"): _*)
  }

  /** Per-group ABSOLUTE cap — the "at most n documents per domain/
    * source/language" curation rule ([[stratified]] caps by RATE; this
    * caps by COUNT, which is what mixture recipes specify). The kept n
    * are the group's smallest `hash60(seed + ":" + id)` values (ties by
    * id) — a deterministic uniform choice, re-drawable with a new
    * `seed`. Unlike the rate filters this is not a narrow map: counting
    * to n needs the group together — ONE shuffle on the group key, and
    * the rank<=n predicate pushes into WindowGroupLimit so each task
    * keeps a bounded buffer instead of sorting whole groups. Changing
    * the corpus can change which docs survive a FULL group (the cap is
    * a ranking, not a threshold) — use [[stratified]] when incremental
    * stability matters more than an exact count. */
  def capPerGroup(df: DataFrame, group: Column, id: Column, n: Int,
                  seed: String = "cap0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Text.hash60(concat_ws(":", lit(seed), id.cast("string")))
    val w = Window.partitionBy(group).orderBy(h.asc, id.asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** [[mixture]] with the recipe weights in TOKENS, not documents — the
    * unit real mixture recipes are actually written in (a training run
    * budgets "300B tokens, 60% web / 30% code / 10% books"; the
    * document-count formulation only matches it when every domain's
    * docs are the same length, which web vs books never are). Per-group
    * supply is `sum(tokens)` (one tiny partial-agg, #groups rows,
    * broadcast back — the [[mixture]] shape exactly), the keep rate is
    * `min(1e6, w_g * targetTokens div tokens_g)` ppm, and thinning is
    * the same seeded uniform id hash — docs are kept or dropped whole,
    * so the expected SURVIVING TOKEN mass per group is
    * `w_g * targetTokens` regardless of the doc-length distribution
    * (uniform thinning is unbiased in any per-doc weight). A group
    * whose token demand exceeds supply clamps to keep-everything;
    * unweighted groups drop. */
  def mixtureByTokens(df: DataFrame, group: Column, id: Column,
                      tokens: Column, weightsPpm: Map[String, Int],
                      targetTokens: Long,
                      seed: String = "mixt0"): DataFrame = {
    val wcol = weightsPpm.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("__g") === k, lit(v.toLong)).otherwise(acc)
    }
    // Rate arithmetic in DECIMAL(38,0), not Long: `w * targetTokens` at
    // frontier-scale budgets (w ppm up to 1e6 × a multi-trillion-token
    // target) exceeds Long.MaxValue around 9.2e12 tokens at full weight,
    // and non-ANSI Long multiply would wrap NEGATIVE — silently dropping
    // the group instead of clamping to keep-everything. A zero-token
    // group (demand > 0, supply 0) clamps to keep-everything explicitly
    // rather than riding a null division into a silent drop.
    val dec38 = "decimal(38,0)"
    val demand = col("__w").cast(dec38) * lit(targetTokens).cast(dec38)
    val supplyPpm = col("__n").cast(dec38) * lit(1000000L).cast(dec38)
    val rates = df.groupBy(group.as("__g"))
      .agg(sum(tokens.cast("long")).as("__n"))
      .withColumn("__w", wcol)
      .withColumn("__rate",
        when(col("__w") <= 0L, lit(0L))
          .when(col("__n") <= 0L || demand >= supplyPpm, lit(1000000L))
          .otherwise((demand / col("__n").cast(dec38)).cast("long")))
    val u = Text.hash60(concat_ws(":", lit(seed), id.cast("string"))) %
      1000000L
    df.join(broadcast(rates), group === col("__g"))
      .where(u < col("__rate"))
      .drop("__g", "__n", "__w", "__rate")
  }

  /** EPOCH-BUDGET PLAN — the recipe-planning step between a designer
    * mixture and [[repeatByRate]]: given target output weights (ppm), a
    * total token budget, and a repetition ceiling, derive each group's
    * sampling rate `min(maxEpochsPpm, w_g·budget·10⁶ div (10⁶·mass_g))`
    * — rates over 10⁶ ppm are epochs of repetition (the published
    * Llama/Pile recipes' "N epochs of Wikipedia" rows), and a group
    * whose demand exceeds the ceiling reports `capped = true` with its
    * achievable `planned_tokens`, so the under-fill is a NUMBER on the
    * plan instead of a surprise at training time. Groups without a
    * weight stay on the report at rate 0 (dropping them would hide
    * corpus mass from the recipe audit), and a WEIGHTED group absent
    * from the corpus — a typo'd key, a source missing from this
    * snapshot — appears with mass 0, rate 0, `capped = true` rather
    * than silently vanishing from the recipe.
    *
    * The output feeds [[repeatByRate]] directly (same ppm semantics:
    * whole copies + a hash-decided fractional one). All arithmetic is
    * integral DECIMAL(38,0) ([[mixtureByTokens]]'s overflow
    * discipline — frontier budgets exceed Long around 9.2e12 tokens at
    * full weight). Scale shape: ONE #groups-row partial-agg over the
    * corpus; nothing else touches the data. */
  def epochPlan(df: DataFrame, group: Column, tokens: Column,
                weightsPpm: Map[String, Int], targetTokens: Long,
                maxEpochsPpm: Long = 4000000L): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    require(maxEpochsPpm > 0, "maxEpochsPpm must be positive")
    val wcol = weightsPpm.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("grp") === k, lit(v.toLong)).otherwise(acc)
    }
    val spark = df.sparkSession
    import spark.implicits._
    // a weighted group ABSENT from the corpus must still appear on the
    // plan (mass 0, rate 0, capped) — a typo'd weight key or a source
    // missing from this snapshot is exactly the surprise the plan
    // exists to surface, not a silently vanished recipe component
    val weightRows = weightsPpm.keys.toSeq.toDF("grp")
    df.groupBy(group.as("grp"))
      .agg(sum(tokens.cast("long")).as("mass"),
        count(lit(1)).as("n_docs"))
      .join(weightRows, Seq("grp"), "full_outer")
      .na.fill(0L, Seq("mass", "n_docs"))
      .withColumn("target_ppm", wcol)
      .withColumn("__raw", expr(
        s"""CASE WHEN target_ppm <= 0 OR mass <= 0 THEN CAST(0 AS decimal(38,0))
           |ELSE (cast(target_ppm as decimal(38,0))
           |      * cast($targetTokens as decimal(38,0))
           |      div cast(1000000 as decimal(38,0)))
           |     * cast(1000000 as decimal(38,0))
           |     div cast(mass as decimal(38,0)) END""".stripMargin))
      .withColumn("rate_ppm",
        least(lit(maxEpochsPpm), col("__raw")).cast("long"))
      .withColumn("planned_tokens", expr(
        "cast(cast(mass as decimal(38,0)) * cast(rate_ppm as decimal(38,0))" +
          " div cast(1000000 as decimal(38,0)) as long)"))
      // capped = the demand is unmeetable: the ceiling bit, OR a
      // weighted group with zero supply (demand > 0, nothing to repeat)
      .withColumn("capped", col("__raw") > lit(maxEpochsPpm) ||
        (col("target_ppm") > 0L && col("mass") <= 0L))
      .select("grp", "mass", "n_docs", "target_ppm", "rate_ppm",
        "planned_tokens", "capped")
  }

  /** TEMPERATURE-smoothed source sampling — the exponential smoothing
    * of the multilingual pretraining recipes (mBERT's and XLM-R's
    * published α-smoothing): sample groups proportionally to `n_g^α`
    * with α = 0.5, the square-root flattening that upweights
    * low-resource languages without letting any one language dominate.
    * Where [[mixture]] takes DESIGNER weights, this DERIVES them from
    * the corpus itself: `s_g = floor(sqrt(n_g))`, keep rate
    * `min(1e6, targetRows·s_g·1e6 div (Σs·n_g))` ppm, thinning by the
    * same seeded id hash — expected output proportions are exactly
    * `s_g / Σs`, the smoothed distribution.
    *
    * Exactness note: `floor(sqrt(n))` over IEEE doubles is
    * deterministic and engine-identical for n < 2⁵² (sqrt is correctly
    * rounded in both engines); the rate arithmetic runs in
    * DECIMAL(38,0) with integral division ([[mixtureByTokens]]'s
    * overflow discipline) so frontier-scale counts cannot wrap. Scale
    * shape = [[mixture]]: one #groups-row partial-agg count + one-row
    * total, broadcast back; the corpus side stays a narrow filter. */
  def temperatureMix(df: DataFrame, group: Column, id: Column,
                     targetRows: Long, seed: String = "temp0"): DataFrame = {
    val counts = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
      .withColumn("__s", floor(sqrt(col("__n"))).cast("long"))
    // "__sum", not "__S": Spark resolution is case-insensitive by
    // default, so "__S" would be ambiguous against "__s"
    val tot = counts.agg(sum("__s").as("__sum"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__rate",
        least(lit(1000000L), expr(
          s"cast($targetRows as decimal(38,0)) * cast(__s as decimal(38,0))" +
            " * cast(1000000 as decimal(38,0)) div" +
            " (cast(__sum as decimal(38,0)) * cast(__n as decimal(38,0)))")))
    val u = Text.hash60(concat_ws(":", lit(seed), id.cast("string"))) %
      1000000L
    df.join(broadcast(rates), group === col("__g"))
      .where(u < col("__rate"))
      .drop("__g", "__n", "__s", "__sum", "__rate")
  }

  /** Weighted corpus MIXTURE — the domain-reweighting step of a
    * training recipe (Pile/DoReMi-style): given target output weights
    * per group (ppm) and a target output size, DERIVE each group's keep
    * rate from the corpus' own group counts,
    * `rate_g = min(1e6, w_g * targetRows div count_g)` ppm, then thin
    * deterministically by seeded id hash. A group whose demand exceeds
    * its supply clamps to keep-everything (the recipe is then
    * under-filled — epoch repetition is the caller's policy decision);
    * groups without a weight are dropped. Unlike [[stratified]] the
    * rates track the corpus, so the output PROPORTIONS stay on target
    * as the corpus grows.
    *
    * Scale shape: one tiny per-group count aggregate (map-side partial,
    * #groups rows), broadcast back onto the corpus — the big side stays
    * a narrow scan + filter, no data-sized shuffle. */
  def mixture(df: DataFrame, group: Column, id: Column,
              weightsPpm: Map[String, Int], targetRows: Long,
              seed: String = "mix0"): DataFrame = {
    val wcol = weightsPpm.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("__g") === k, lit(v.toLong)).otherwise(acc)
    }
    val rates = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", wcol)
      .withColumn("__rate",
        least(lit(1000000L), expr(s"__w * $targetRows div __n")))
    val u = Text.hash60(concat_ws(":", lit(seed), id.cast("string"))) %
      1000000L
    df.join(broadcast(rates), group === col("__g"))
      .where(u < col("__rate"))
      .drop("__g", "__n", "__w", "__rate")
  }
}
