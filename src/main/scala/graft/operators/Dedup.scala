package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale posture: everything is expressed as keyed aggregations and
  * bucket-joins — the only shuffles are on (dedup key), (doc id) and
  * (band key); no global cross product ever materializes. MinHash bands
  * turn the O(N²) pair problem into same-bucket joins, and the Jaccard
  * verifier only runs on candidate or same-block pairs.
  *
  * Hashes are md5-based (hex-string min is a valid permutation min), so
  * signatures are engine-independent and reproducible anywhere.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per key. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], idCol: String)
      : DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("representative_id"),
        count(lit(1)).as("n_duplicates"))

  /** k-word shingles (default 3) of a whitespace-tokenized text column.
    * Empty array for texts shorter than k tokens (NB: Spark's
    * `sequence(1,0)` counts DOWN, hence the explicit guard). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    val idx = sequence(lit(1), size(toks) - (k - 1))
    when(size(toks) >= k,
      transform(idx, i => concat_ws(" ",
        (0 until k).map(off => element_at(toks, i + off)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-doc MinHash signature as ONE array column.
    *
    * Hash budget: 2 md5 per shingle (md5(s) ‖ md5(reverse(s)) = 64 hex
    * chars) sliced into `numHashes` 8-char (32-bit) permutation values,
    * instead of one md5 per (shingle × permutation). The whole
    * signature is a single `aggregate` fold expression (sig[p] =
    * min over shingles of slice p), so Spark's CollapseProject cannot
    * duplicate the expensive md5 work into every consumer — and the
    * trailing one-row-per-doc groupBy materializes it once before the
    * band explode. Hex-string minima are valid permutation minima
    * (lexicographic = numeric on fixed-width hex). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, shingleK: Int = 3): DataFrame = {
    require(numHashes <= 16,
      "2×64 hex chars → at most 16 32-bit slices (8 per md5-pair block)")
    // spread: the minhash kernel fuses into the (single-row-group
    // fixture) scan and would run single-threaded (Tables.spread)
    graft.Tables.spread(df)
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= shingleK)
      .select(col(idCol),
        graft.functions.HashExprs.minhashSig(col("toks"), numHashes,
          shingleK).as("sig"))
      // one-row-per-doc agg barrier: materializes sig so downstream
      // consumers (band explode reads 8 elements) can't trigger
      // CollapseProject re-evaluation of the hash kernel
      .groupBy(col(idCol)).agg(min(col("sig")).as("sig"))
  }

  /** LSH bands: group the signature into bands of `bandSize` hashes;
    * band key = md5(bandId : h_i : h_{i+1} …). One row per (id, band). */
  def minhashBands(sigs: DataFrame, idCol: String, numHashes: Int = 8,
      bandSize: Int = 2): DataFrame = {
    // one explode over the materialized sig array (cheap element reads)
    val bandStructs = (0 until numHashes / bandSize).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(":", lit(b.toString) +:
          (0 until bandSize).map(j =>
            element_at(col("sig"), b * bandSize + j + 1)): _*))
          .as("bandKey"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"),
        col("bs.bandKey").as("bandKey"))
  }

  /** Candidate near-dup pairs: ids sharing ≥1 LSH band bucket. The join
    * key is the band bucket — collisions, not the corpus, bound the
    * work. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, shingleK: Int = 3)
      : DataFrame = {
    val bands = minhashBands(
      minhashSignatures(df, idCol, textCol, numHashes, shingleK),
      idCol, numHashes, bandSize)
    val a = bands.select(col("bandKey"), col(idCol).as("d1"))
    val b = bands.select(col("bandKey").as("bk2"), col(idCol).as("d2"))
    a.join(b, col("bandKey") === col("bk2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs within a blocking key
    * (or for verified candidates). jaccard = |A∩B| / |A∪B| over distinct
    * shingle sets. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double, shingleK: Int = 3)
      : DataFrame = {
    val withSh = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        graft.functions.HashExprs.shingleSet(split(col(textCol), " "),
          shingleK).as("shset"): _*)
    val a = withSh.select(
      col(idCol).as("d1") +: col("shset").as("s1") +:
        blockCols.map(c => col(c).as(s"a_$c")): _*)
    val b = withSh.select(
      col(idCol).as("d2") +: col("shset").as("s2") +:
        blockCols.map(c => col(c).as(s"b_$c")): _*)
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val inter = size(array_intersect(col("s1"), col("s2")))
    val uni = size(col("s1")) + size(col("s2")) - inter
    a.join(b, blockEq && col("d1") < col("d2"))
      .withColumn("jaccard",
        when(uni === 0, 0.0)
          .otherwise(inter.cast("double") / uni.cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The scale path: MinHash-LSH candidate generation followed by exact
    * n-gram Jaccard verification on the candidates only — the pair work
    * is bounded by bucket collisions, never by N².
    *
    * The expensive shingle-set projection runs exactly ONCE per
    * DISTINCT candidate member: the corpus joins the (tiny, id-only)
    * distinct-member set first, shingles the survivors, and only then
    * fans the per-member sets out to their (pair, side) rows. A doc
    * appearing in P candidate pairs was previously shingled P times —
    * on near-dup-heavy corpora pair counts grow quadratically with
    * duplicate-group size while distinct members grow linearly, so
    * that recomputation was the dominant verify cost (measured 39× at
    * the sf1→sf10 decade before this restructure). The corpus is
    * scanned once, never shuffles, and is never shingled wholesale.
    *
    * `broadcastCandidates = false` is the escape hatch for near-dup-
    * heavy corpora: LSH collisions are quadratic in bucket size, so a
    * boilerplate-dominated corpus can blow the candidate set past the
    * broadcast limit — the flag degrades to a shuffled member join
    * (corpus shuffles on id) instead of failing on the 8 GB
    * broadcast ceiling / driver OOM. */
  def verifiedNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 8, bandSize: Int = 2,
      shingleK: Int = 3, broadcastCandidates: Boolean = true)
      : DataFrame = {
    // materialize the candidate pairs ONCE: both the distinct-member
    // probe and the per-pair fan-out below consume them, and Spark
    // shares no common subplan across two broadcast branches — without
    // the checkpoint the whole signature+band join would run twice.
    // The pair list is collision-bounded (two longs per row), so this
    // is a tiny executor-memory materialization, same rationale as
    // connectedComponents' edge checkpoint.
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bandSize,
      shingleK).localCheckpoint()
    val members = cands.select(col("d1"), col("d2"),
        explode(array(
          struct(col("d1").as("member"), lit(1).as("side")),
          struct(col("d2").as("member"), lit(2).as("side")))).as("m"))
      .select(col("d1"), col("d2"), col("m.member").as("member"),
        col("m.side").as("side"))
    val distinctMembers = members.select(col("member").as("dm")).distinct()
    val toks = df.select(col(idCol).as("sid"),
      split(col(textCol), " ").as("toks"))
    // one shingle-set evaluation per distinct member (id-only probe side
    // broadcast; single consumer below, so Catalyst cannot duplicate the
    // kernel into per-pair branches)
    val dmSide =
      if (broadcastCandidates) broadcast(distinctMembers)
      else distinctMembers
    val memberSets = toks.join(dmSide, col("sid") === col("dm"))
      .select(col("sid"),
        graft.functions.HashExprs.shingleSet(col("toks"), shingleK)
          .as("shset"))
    val memberSide =
      if (broadcastCandidates) broadcast(members) else members
    val sets = memberSets.join(memberSide, col("sid") === col("member"))
      .select(col("d1"), col("d2"), col("side"), col("shset"))
    val inter = size(array_intersect(col("s1"), col("s2")))
    val uni = size(col("s1")) + size(col("s2")) - inter
    sets.groupBy(col("d1"), col("d2"))
      .agg(
        first(when(col("side") === 1, col("shset")), ignoreNulls = true)
          .as("s1"),
        first(when(col("side") === 2, col("shset")), ignoreNulls = true)
          .as("s2"))
      .withColumn("jaccard",
        when(uni === 0, 0.0)
          .otherwise(inter.cast("double") / uni.cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected components over an undirected edge list (the clustering
    * step after near-dup pair generation: every doc in a component is a
    * mutual near-dup group; keep one representative per component).
    *
    * Iterative min-label propagation: comp(v) starts as v and each
    * round takes the min over v and its neighbors' labels, converging
    * in O(component diameter) rounds — near-dup components are small
    * dense cliques (diameter 1-2), so 2-3 rounds in practice, with
    * `maxIter` as the safety cap and early exit on fixpoint. Each round
    * is ONE shuffle on the node key; lineage is cut per round with
    * localCheckpoint so the plan stays constant-size instead of growing
    * a join per iteration. For adversarial long-chain graphs at 100 TB
    * swap in the alternating large-star/small-star algorithm
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * same per-round shuffle shape, O(log²) rounds.
    *
    * Returns (id, comp) for every node that appears in an edge, where
    * comp = min node id of the component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // materialize the (possibly expensive) edge derivation ONCE — and
    // BEFORE the symmetrization union, which would otherwise evaluate
    // the whole upstream pair-generation plan once per branch (Spark
    // does not dedupe common subplans outside exchange reuse). Every
    // propagation round then joins against the cheap checkpointed rows.
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint()
    val sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
      // the previous label rides along so convergence is a filter over
      // the checkpointed round output, not an extra join
      val next = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"))
        .localCheckpoint()
      converged = next.filter(col("comp") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    if (!converged)
      // labels are still changing: some component's propagation
      // distance exceeds maxIter and its nodes carry SPLIT labels.
      // Surface it loudly — a silently wrong clustering is the worst
      // failure mode a dedup pipeline can have.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds; long-chain components are split. Raise maxIter or " +
          "switch to the large-star/small-star algorithm for this graph.")
    labels
  }

  /** Incremental dedup: the rows of a NEW `batch` whose `fpCol` does
    * not already exist in the `base` corpus — the per-ingest step of a
    * continuously-growing training set, where re-deduplicating the
    * whole corpus per batch is the naive O(corpus) trap.
    *
    * The base corpus NEVER shuffles and is scanned once:
    *  1. a Bloom filter over xxhash64(base fp) (a few MB at any base
    *     cardinality) probes the batch map-side — no false negatives,
    *     so non-candidates are PROVEN new;
    *  2. candidate fps (true hits + ~fpp of the batch) broadcast into
    *     a map-side semi-join against base, yielding the exact set of
    *     fps actually present;
    *  3. the batch anti-joins that (still broadcast-sized) present set
    *     — survivors are exact, Bloom false positives corrected.
    * Cost at 100 TB: one base scan + one batch scan + two broadcasts
    * bounded by the candidate count; the only exchanges are the
    * candidate/present distincts (bounded by collisions, not corpus).
    * In-batch duplicates are NOT collapsed here — batch-side grouping
    * is the caller's policy (see the dedup_incremental query). */
  def incrementalNew(base: DataFrame, batch: DataFrame, fpCol: String,
      fpp: Double = 0.01): DataFrame = {
    // lineage cut: the hashed base fp set feeds the sizing count and
    // the bloom build; without it both actions re-scan the base
    val hashedBase = base.select(xxhash64(col(fpCol)).as("h"))
      .distinct().localCheckpoint()
    val nBase = math.max(hashedBase.count(), 1L)
    val bloom = hashedBase.stat.bloomFilter("h", nBase, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val candFps = batch
      .filter(Contamination.bloomProbe(bytes, col(fpCol)))
      .select(col(fpCol)).distinct().localCheckpoint()
    // lineage cut on the (candidate-bounded) present set: Catalyst
    // pushes the anti-join through any Union in the batch, duplicating
    // the build-side subplan per branch — without the cut the base
    // scan + semi-join re-executes once per batch branch (caught by
    // PlanAuditSpec: 3 base scans for a 3-branch batch)
    val present = base
      .join(broadcast(candFps), Seq(fpCol), "left_semi")
      .select(col(fpCol)).distinct().localCheckpoint()
    batch.join(broadcast(present), Seq(fpCol), "left_anti")
  }

  /** C4-style sub-document span dedup: each document's token stream is
    * cut into fixed-width spans of `span` tokens (the last span may be
    * shorter); every span that already occurred EARLIER in the corpus
    * (smaller (doc id, position)) is dropped; survivors are reassembled
    * in document order. This is the granularity the whole-document
    * dedup family above cannot reach — boilerplate repeated across
    * otherwise-distinct documents (the C4 "deduplicate three-sentence
    * spans" step, arXiv:1910.10683 §2.2).
    *
    * Output: one row per input document —
    * (idCol, n_spans, n_kept, text_md5 of the reassembled text; a doc
    * whose every span was seen earlier keeps 0 spans and hashes "").
    *
    * Scale shape: the winner per span value is `min` over a
    * fixed-width zero-padded "(id):(pos)" sort key (lexicographic min
    * = (id, pos) min for non-negative longs) — a scalar min the
    * planner keeps HASH-aggregated (a `min(struct(..))` spelling falls
    * back to SortAggregate, which sorts every partition's occurrence
    * stream; verified on the sf0.1 plan). So the per-span work is a
    * map-side-combinable agg — NOT a row_number window, and no sort of
    * the occurrence stream — and the survivors filter is a join back
    * on the SAME span key (co-partitioned with the agg's exchange at
    * scale; AQE broadcasts the winner side at test SFs). Reassembly is
    * one keyed shuffle on the doc id. A mega-frequent span (site
    * boilerplate at 100 TB) costs its occurrence count in the
    * combiner, never a sorted frame. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      span: Int = 3): DataFrame = {
    require(span >= 1)
    val id = col(idCol)
    val toksed = df.select(id,
      filter(split(col(textCol), " "), t => t =!= "").as("toks"))
    // ceil(len/span) in double is exact far beyond any document length
    val withN = toksed.withColumn("n_spans",
      ceil(size(col("toks")).cast("double") / span).cast("long"))
    val chunks = withN
      .select(id, col("n_spans"),
        // sequence(0,-1) counts DOWN (same pitfall as shingles) —
        // empty docs must yield an empty span array, not [0,-1]
        posexplode(when(col("n_spans") > 0, transform(
          sequence(lit(0L), col("n_spans") - 1),
          i => concat_ws(" ",
            slice(col("toks"), (i * span + 1).cast("int"), lit(span)))))
          .otherwise(array().cast("array<string>"))))
      .select(id, col("pos").cast("long").as("p"), col("col").as("chunk"))
    // single-long pack: (id << 20) | pos orders exactly like (id, pos)
    // for id < 2^43, pos < 2^20 (a 3M-token doc) — a LONG min is the
    // only spelling the planner hash-aggregates (struct and string
    // buffers both fall back to SortAggregate over the occurrence
    // stream; verified on the sf0.1 plan). Out-of-range inputs fail
    // loudly rather than dedup wrongly.
    def packed = when(id < (1L << 43) && id >= 0 && col("p") < (1L << 20),
      shiftleft(id, 20) + col("p"))
      .otherwise(raise_error(lit(
        "spanDedup: doc id >= 2^43 or span position >= 2^20")))
    val winners = chunks.groupBy(col("chunk"))
      .agg(min(packed).as("w"))
    val kept = chunks.join(winners, "chunk")
      .filter(packed === col("w"))
      .select(id, col("p"), col("chunk"))
    val reassembled = kept.groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("p"), col("chunk")))),
            s => s.getField("chunk")))).as("text_md5"))
    withN.select(id, col("n_spans"))
      .join(reassembled, Seq(idCol), "left")
      .select(id, col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_md5"), md5(lit(""))).as("text_md5"))
  }

  /** SimHash fingerprint (bits from the first bits/4 hex nibbles of each
    * token's md5; per-bit ±1 votes summed over tokens; fp bit = vote>0).
    * Near-dup candidates then join on fingerprint (or low Hamming
    * distance). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame = {
    require(bits % 4 == 0 && bits <= 32)
    val exploded = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until bits).map { b =>
      val nib = conv(substring(col("h"), b / 4 + 1, 1), 16, 10).cast("int")
      val bit = nib.divide(lit(1 << (b % 4))).cast("int") % 2
      sum(bit * 2 - 1).as(s"v$b")
    }
    exploded.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Asymmetric CONTAINMENT near-dup join — finds documents mostly
    * CONTAINED in another (C(A→B) = |sh(A)∩sh(B)| / |sh(A)| with
    * |sh(A)| ≤ |sh(B)|), the boilerplate/sub-document case symmetric
    * Jaccard is structurally blind to: a 50-shingle doc inside a
    * 500-shingle doc has J ≈ 0.1 (minhash banding never surfaces it)
    * but C = 1.0. Blocking is prefix filtering from the set-similarity
    * join literature (AllPairs/PPJoin family): every doc PROBES with
    * its `probeK` lowest-md5 distinct shingles, the posting side drops
    * shingles with df > `dfCap`, and a candidate is any (probe,
    * posting) shingle match — fanout is ≤ probeK·dfCap pairs per doc
    * BY CONSTRUCTION, the bounded-occupancy discipline of
    * hard_negatives_capped. If C(A→B) ≥ 0.9, each of A's probe
    * shingles is in B w.p. ≥ 0.9 under hash-random selection, so the
    * miss rate is ≲ 0.1^probeK plus the df-cap loss — priced honestly
    * by the planted-recall gate, never assumed.
    *
    * Pairs orient small-into-big ((nsh, id) lexicographic), verify
    * exactly on the distinct-shingle sets, and pass at
    * 10·inter ≥ thrTimes10·n1 — exact integer algebra, no division.
    * The `sets` frame is localCheckpoint'd: postings, probes, and both
    * verify sides consume it, and Spark replans per reference
    * (the collocations_pmi lesson — without the cut the shingle
    * kernel runs four times). */
  def containmentNearDups(df: DataFrame, idCol: String, textCol: String,
      thrTimes10: Int = 9, probeK: Int = 4, dfCap: Int = 64)
      : DataFrame = {
    // spread: the shingle kernel fuses into the (single-row-group
    // fixture) scan and would run single-threaded (Tables.spread)
    val toks = graft.Tables.spread(df).select(col(idCol).as("sid"),
      split(col(textCol), " ").as("toks"))
    val sets = toks.select(col("sid"),
        graft.functions.HashExprs.shingleSet(col("toks"), 3).as("shset"))
      .filter(size(col("shset")) > 0)
      .localCheckpoint()
    val dsh = sets.select(col("sid"), explode(col("shset")).as("sh"))
    val rare = dsh.groupBy(col("sh")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= dfCap).select(col("sh"))
    val post = dsh.join(rare, "sh").select(col("sh"), col("sid").as("b"))
    // probeK lowest-(md5, sh) shingles per doc via the bounded TopK
    // aggregate instead of a row_number window (r14 optimization,
    // guide §2.3 "aggregate before you shuffle"): the window spelling
    // shuffled and sorted EVERY (sid, sh) row; TopKAgg folds to ≤K
    // entries map-side, so only ≤K·docs tiny rows cross the exchange.
    // Priority = md5(sh) ‖ sh — md5 is fixed-width hex, so UTF8String
    // order on the concatenation IS the (md5(sh), sh) lexicographic
    // order the window used; the shingle is recovered as the suffix.
    val probe = dsh.groupBy(col("sid"))
      .agg(graft.operators.TopK.topK(
        concat(md5(col("sh")), col("sh")), col("sid"), probeK).as("top"))
      .select(col("sid").as("a"), explode(col("top")).as("e"))
      .select(col("a"), expr("substring(e.pri, 33)").as("sh"))
    // candidate (a, b) pairs, deduped across probe shingles; sizes and
    // shingle sets are fetched ONCE and the canonical orientation is
    // derived from the fetched arrays (r14 optimization: the old
    // spelling joined a node-sized `sized` table twice and re-deduped
    // the flipped pairs before fetching the arrays again — two joins
    // and one distinct that the fetch already pays for). A mirrored
    // pair (a,b)/(b,a) orients to the same (d1,d2) row with identical
    // scores, so the final distinct keeps the output set unchanged.
    // r15 (guide §2.2 sizing vs CPU density): the pair-dedup exchange
    // is tiny in BYTES (16 B/pair), so AQE's byte-targeted coalescing
    // folded it to ONE partition — and the whole downstream verify
    // span (two broadcast array fetches + array_intersect per pair)
    // is CPU-dense, so the query's hottest stage ran single-threaded
    // at any core count. A user-specified repartition is exempt from
    // AQE coalescing and pins the verify stage at cluster parallelism
    // (defaultParallelism — scale-adaptive, no local constant).
    val cand = probe.join(post, "sh")
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("a"), col("b"))
      .distinct()
    val flip = size(col("sa")) > size(col("sb")) ||
      (size(col("sa")) === size(col("sb")) && col("a") > col("b"))
    cand
      .join(sets.select(col("sid").as("a"), col("shset").as("sa")), "a")
      .join(sets.select(col("sid").as("b"), col("shset").as("sb")), "b")
      .select(when(flip, col("b")).otherwise(col("a")).as("d1"),
        when(flip, col("a")).otherwise(col("b")).as("d2"),
        when(flip, col("sb")).otherwise(col("sa")).as("s1"),
        when(flip, col("sa")).otherwise(col("sb")).as("s2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("s1"), col("s2"))).cast("long")
          .as("inter"),
        size(col("s1")).cast("long").as("n1"),
        size(col("s2")).cast("long").as("n2"))
      .filter(col("inter") * 10 >= col("n1") * thrTimes10)
      .distinct()
  }
}
