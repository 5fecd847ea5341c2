package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Operator-package helpers shared across all query implementations. */
package object operators {

  /** Conf flag: keep the terminal ORDER BY the driver/oracle contract needs
    * (deterministic row order for result hashing). Default true. Production
    * callers writing billion-row outputs set it to `false` and skip the
    * global range-shuffle + sort that would otherwise be the last (and at
    * 100 TB, dominant) stage of every per-document query.
    */
  val OrderedOutputKey = "spark.graft.orderedOutput"

  /** Tunable scale knobs, read from the active session's `spark.graft.*`
    * confs at plan-build time with the test-scale values as defaults. The
    * oracle SQL generators read the SAME accessors, so a non-default knob
    * flows into both engines and parity holds at any setting. At 100 TB
    * these are the numbers a deployment sizes to its cluster (shards =
    * O(executors), k = O(√corpus) cells, …) — they must never require a
    * recompile.
    */
  object GraftConf {
    private def get(key: String, default: String): String =
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.conf.get(key, default)).getOrElse(default)

    private def positive(key: String, default: String): Int = {
      val raw = get(key, default)
      val v = try raw.toInt catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$key must be an integer >= 1, got '$raw'", e)
      }
      require(v >= 1, s"$key must be >= 1, got $v")
      v
    }

    /** Fraction in (0, 1]: similarity thresholds. */
    private def fraction(key: String, default: String): Double = {
      val raw = get(key, default)
      val v = try raw.toDouble catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$key must be a fraction in (0, 1], got '$raw'", e)
      }
      require(v > 0 && v <= 1, s"$key must be in (0, 1], got $v")
      v
    }

    /** Independent packing shards (`spark.graft.pack.shards`). */
    def packShards: Int = positive("spark.graft.pack.shards", "8")
    /** Packed-sequence token budget (`spark.graft.pack.seqTokens`). */
    def packSeqTokens: Int = positive("spark.graft.pack.seqTokens", "512")
    /** Size-balanced output shards (`spark.graft.pack.balanceShards`). */
    def packBalanceShards: Int = positive("spark.graft.pack.balanceShards", "8")
    /** BM25 query terms, comma-separated (`spark.graft.bm25.terms`).
      * Terms are interpolated into generated SQL and lambda predicates, so
      * only word characters are accepted — a quote or regex metachar in a
      * term fails loudly here instead of silently corrupting the query.
      */
    def bm25Terms: Seq[String] = {
      val terms = get("spark.graft.bm25.terms", "vector,merge,stream").split(",").toSeq
      require(terms.nonEmpty && terms.forall(_.matches("[A-Za-z0-9_]+")),
        s"spark.graft.bm25.terms must be comma-separated word-character terms, got: ${terms.mkString(",")}")
      terms
    }
    /** k-means cluster count (`spark.graft.kmeans.k`). */
    def kmeansK: Int = positive("spark.graft.kmeans.k", "10")
    /** k-means assignment rounds, ≥ 1 (`spark.graft.kmeans.iters`). */
    def kmeansIters: Int = positive("spark.graft.kmeans.iters", "2")
    /** Quantizer train-sample modulus (`spark.graft.kmeans.trainSampleMod`):
      * Lloyd rounds train on vec_id % mod == 0 only; assignment still covers
      * the full corpus. 1 (default) = train on everything. At 100 TB nobody
      * Lloyd-scans the corpus to fit K centroids — IVF quantizers train on
      * a sample (FAISS trains on ~max(256·K, 1M) points); this is that
      * switch, deterministic so the oracle can mirror it.
      */
    def kmeansTrainSampleMod: Int = positive("spark.graft.kmeans.trainSampleMod", "1")

    // -- dedup knobs: a deployment tunes recall and skew caps per corpus --
    /** Shingle width in words (`spark.graft.dedup.shingleWords`). */
    def shingleWords: Int = positive("spark.graft.dedup.shingleWords", "3")
    /** Hot-shingle document-frequency cap (`spark.graft.dedup.hotShingleDf`). */
    def hotShingleDf: Int = positive("spark.graft.dedup.hotShingleDf", "64")
    /** LSH bands (`spark.graft.dedup.bands`). */
    def minhashBands: Int = positive("spark.graft.dedup.bands", "4")
    /** MinHash rows per band (`spark.graft.dedup.rowsPerBand`). */
    def minhashRowsPerBand: Int = positive("spark.graft.dedup.rowsPerBand", "4")
    /** Jaccard similarity threshold (`spark.graft.dedup.jaccardTau`). */
    def jaccardTau: Double = fraction("spark.graft.dedup.jaccardTau", "0.5")
    /** MinHash verify threshold (`spark.graft.dedup.minhashTau`). */
    def minhashTau: Double = fraction("spark.graft.dedup.minhashTau", "0.5")
    /** Embedding near-dup cosine threshold (`spark.graft.dedup.cosineTau`). */
    def cosineTau: Double = fraction("spark.graft.dedup.cosineTau", "0.35")
    /** Hot band-bucket cap (`spark.graft.dedup.hotBandDocs`). */
    def hotBandDocs: Int = positive("spark.graft.dedup.hotBandDocs", "64")
    /** Packed-BIGINT occurrence-key fast path
      * (`spark.graft.dedup.packedOccKey`): the keep-first lanes'
      * (doc_id, offset) key as `doc_id·2^20 + offset` — a codegen-
      * primitive min/compare — instead of the default `struct` key.
      * OPT-IN with a stated precondition: valid only where doc_id < 2^43
      * is a corpus invariant (synthetic tables; NEVER the 60-bit crawl
      * bridge, where the packed form overflows). Orders identically to
      * the struct under the precondition, so results cannot drift.
      */
    def dedupPackedOccKey: Boolean =
      get("spark.graft.dedup.packedOccKey", "false").toBoolean
    /** SemDeDup within-cell cosine threshold
      * (`spark.graft.dedup.semTau`): pairs at or above it inside one
      * trained kmeans cell are semantic duplicates (Abbas et al. 2023 use
      * ε ≈ 0.95 on real embeddings; the synthetic corpus's planted
      * near-dups sit lower, so the default matches `cosineTau`).
      */
    def dedupSemTau: Double = fraction("spark.graft.dedup.semTau", "0.35")

    /** Semantic decontamination cosine threshold
      * (`spark.graft.decontam.semTau`): a train item within this cosine
      * of any benchmark item is flagged a paraphrase-level leak.
      */
    def decontamSemTau: Double = fraction("spark.graft.decontam.semTau", "0.35")
    /** Per-cluster prototype-prune drop percentage
      * (`spark.graft.prune.dropPct`): the easiest (most prototypical =
      * closest-to-centroid) pct% of each kmeans cell is dropped
      * (Sorscher et al. 2022 — on large corpora pruning EASY examples
      * beats random). Integer 0..100; compared in exact integer math.
      */
    def pruneDropPct: Int = {
      val v = positive("spark.graft.prune.dropPct", "25")
      require(v <= 100, s"spark.graft.prune.dropPct must be <= 100, got $v")
      v
    }
    /** Connected-components iteration backstop
      * (`spark.graft.dedup.ccMaxIters`).
      */
    def ccMaxIters: Int = positive("spark.graft.dedup.ccMaxIters", "20")
    /** Multi-probe cell-assignment width for trained-quantizer embedding
      * dedup (`spark.graft.dedup.embedNProbe`): each vector blocks into its
      * N nearest trained cells so near-boundary pairs still share a cell.
      */
    def dedupEmbedNProbe: Int = positive("spark.graft.dedup.embedNProbe", "2")
    /** Signed-random-projection signature width in bits
      * (`spark.graft.dedup.srpBits`): hyperplane count for the training-free
      * cosine-LSH embedding blocker. More bits = finer buckets = fewer
      * candidates but lower recall per band.
      */
    def dedupSrpBits: Int = positive("spark.graft.dedup.srpBits", "32")
    /** Bits per SRP band (`spark.graft.dedup.srpBandBits`); must divide
      * srpBits. bands = srpBits / srpBandBits, and a pair is a candidate if
      * ANY band of sign-bits matches exactly.
      */
    def dedupSrpBandBits: Int = positive("spark.graft.dedup.srpBandBits", "4")
    /** Embedding dimensionality the SRP planes are generated for
      * (`spark.graft.dedup.srpDims`): a property of the embedding model, so
      * a conf constant — the streaming lane cannot probe it from data (an
      * action on a streaming frame is illegal) and the plane matrix must be
      * fixed at plan time. A vector of any other length fails loudly via an
      * in-expression assert, never by silently mis-signing.
      */
    def dedupSrpDims: Int = positive("spark.graft.dedup.srpDims", "64")
    /** Salting factor for the dedup verify re-joins
      * (`spark.graft.dedup.verifySalts`, default 1 = plain join). The
      * candidate-pair → sets/embeddings re-join is the one dedup join whose
      * key can be HOT (a boilerplate template near-duplicated 10⁴× appears
      * in ~10⁴ candidate pairs, all hashing to one reducer); salts > 1
      * routes a hot doc's pairs across `salts` reducers via
      * [[Skew.saltedJoin]], replicating only the narrow per-doc sets
      * relation. Plan-only: results are identical at any value
      * (spec-asserted), so the oracle SQL never sees it.
      */
    def dedupVerifySalts: Int = positive("spark.graft.dedup.verifySalts", "1")
    /** SRP hot-bucket cap (`spark.graft.dedup.srpHotBandDocs`) — separate
      * from the minhash cap because SRP band values live in a 2^srpBandBits
      * space (dense by construction), not a 60-bit hash space: the same
      * corpus packs ~2^(60-srpBandBits)× more docs per SRP bucket, so the
      * sane default is higher and a deployment sizes srpBandBits ≈
      * log2(corpus / this cap) as the corpus grows.
      */
    def dedupSrpHotBandDocs: Int = positive("spark.graft.dedup.srpHotBandDocs", "256")
    /** Fuzzy-decontamination Jaccard threshold
      * (`spark.graft.decontam.fuzzyTau`): a train doc is flagged when its
      * shingle-set Jaccard against any eval doc reaches this. Tuned apart
      * from the dedup taus — contamination matters below near-dup level.
      */
    def decontamFuzzyTau: Double = fraction("spark.graft.decontam.fuzzyTau", "0.5")
    /** Exact-sweep n-gram width (`spark.graft.decontam.ngram`): 13 in the
      * GPT-3/PaLM recipe; default 5 scales to the short synthetic docs.
      */
    def decontamNgram: Int = positive("spark.graft.decontam.ngram", "5")
    /** Eval-set id modulus for the FUZZY sweep
      * (`spark.graft.decontam.fuzzyEvalMod`). Deliberately different from
      * the exact sweep's 97: the synthetic corpus's planted near-dup pairs
      * never straddle the %97 boundary at the shipped scale factors, so a
      * %97 fuzzy sweep would be vacuously green — %29 puts real
      * above-tau cross-set pairs in scope at sf0.001/0.01/0.1 (3/5/20
      * pairs respectively, measured in SURVEY §6). Production callers use
      * [[graft.operators.Curation.decontaminateFuzzyFrom]] with their real
      * benchmark membership predicate; the mod only parameterizes the
      * oracle-facing default.
      */
    def decontamFuzzyEvalMod: Int = positive("spark.graft.decontam.fuzzyEvalMod", "29")

    // -- ANN knobs --
    /** Query-vector count (`spark.graft.ann.queries`). */
    def annQueries: Int = positive("spark.graft.ann.queries", "10")
    /** Neighbors per query (`spark.graft.ann.topK`). */
    def annTopK: Int = positive("spark.graft.ann.topK", "5")
    /** IVF probe width (`spark.graft.ann.nprobe`). */
    def annNProbe: Int = positive("spark.graft.ann.nprobe", "2")
    /** Quantization levels per sign for the int8 cosine path
      * (`spark.graft.ann.quantLevels`): 127 = full int8, 7 = int4-style.
      * Capped at 127 so quantized components always fit a signed byte.
      */
    def annQuantLevels: Int = {
      val v = positive("spark.graft.ann.quantLevels", "127")
      require(v <= 127, s"spark.graft.ann.quantLevels must be <= 127, got $v")
      v
    }
    /** PQ subspace count (`spark.graft.ann.pqSubs`): the embedding is cut
      * into this many contiguous sub-vectors, each with its own trained
      * codebook; a vector's index entry is pqSubs small codes (8 bytes at
      * the defaults vs 256 bytes of raw float — the ~32× index-IO cut
      * that makes PQ the 100 TB ANN lever).
      */
    def annPqSubs: Int = positive("spark.graft.ann.pqSubs", "8")
    /** Centroids per PQ subspace codebook (`spark.graft.ann.pqK`). */
    def annPqK: Int = positive("spark.graft.ann.pqK", "32")
    /** Lloyd rounds per subspace codebook (`spark.graft.ann.pqIters`) —
      * same convention as `spark.graft.kmeans.iters`.
      */
    def annPqIters: Int = positive("spark.graft.ann.pqIters", "2")
    /** ADC candidate pool re-ranked exactly per query
      * (`spark.graft.ann.pqRerank`); must be ≥ topK.
      */
    def annPqRerank: Int = positive("spark.graft.ann.pqRerank", "64")

    // -- text-analysis knobs --
    /** Repeated-substring window width in words
      * (`spark.graft.text.dupWindowWords`): ~50 BPE tokens in the exact-
      * substring-dedup literature maps to ~8 words at test vocab; a
      * deployment sizes it to its tokenizer.
      */
    def dupWindowWords: Int = positive("spark.graft.text.dupWindowWords", "8")
    /** Top-N repeated windows reported (`spark.graft.text.dupTopN`). */
    def dupTopN: Int = positive("spark.graft.text.dupTopN", "20")
    /** Perplexity-bucket threshold-sample modulus
      * (`spark.graft.ppl.sampleMod`): the head/middle/tail cuts are order
      * statistics of the nll distribution over docs with
      * `doc_id % mod == 0`. CCNet computes its bucket thresholds from a
      * held-out sample, not the full crawl — the mod sizes that sample so
      * its single-reducer rank pass stays trivial at any corpus size
      * (raise it as the corpus grows; 3 keeps the sample meaningful at the
      * shipped test scale factors).
      */
    def pplSampleMod: Int = positive("spark.graft.ppl.sampleMod", "3")
    /** Jelinek-Mercer bigram interpolation weight
      * (`spark.graft.ppl.lambda`): share of the bigram MLE in the
      * interpolated probability; the unigram floor gets `1 - lambda`.
      */
    def pplLambda: Double = fraction("spark.graft.ppl.lambda", "0.9")
    /** Per-doc tf-idf terms kept (`spark.graft.tfidf.topK`). */
    def tfidfTopK: Int = positive("spark.graft.tfidf.topK", "3")
    /** Line-dedup unit width in words (`spark.graft.linedd.chunkWords`):
      * the corpus has no newline structure, so the CCNet "paragraph" is a
      * tumbling window of this many words; a deployment over real crawl
      * text splits on newlines instead and the keep-first hash logic is
      * unchanged.
      */
    def lineChunkWords: Int = positive("spark.graft.linedd.chunkWords", "12")
    /** BPE merge count (`spark.graft.bpe.merges`): how many merge rules
      * the trainer learns. Production vocabularies run this at 30k+; the
      * training loop's cost is merges × (one pass over the DISTINCT-WORD
      * table), independent of corpus size, so the knob prices vocabulary
      * quality, not corpus scans.
      */
    def bpeMerges: Int = positive("spark.graft.bpe.merges", "8")
    /** Reciprocal-rank-fusion constant (`spark.graft.rrf.k`, Cormack et
      * al. 2009's k = 60).
      */
    def rrfK: Int = positive("spark.graft.rrf.k", "60")
    /** Per-list fusion depth (`spark.graft.rrf.depth`): how many ranks of
      * each retrieval list (dense ANN, lexical BM25) enter the fusion.
      */
    def rrfDepth: Int = positive("spark.graft.rrf.depth", "10")
    /** Stored-hybrid vocabulary pushdown cap
      * (`spark.graft.rrf.vocabPushdownMax`): the largest query vocabulary
      * still pushed as a literal `IN` filter into the postings scan
      * (static file/row-group pruning). A bigger batch of queries falls
      * back to a broadcast semi-join — row-level filtering without
      * file pruning, but the plan no longer carries a multi-MB literal
      * list. PLAN-ONLY: results identical at any value (spec-asserted),
      * so the oracle SQL never sees it.
      */
    def rrfVocabPushdownMax: Int =
      positive("spark.graft.rrf.vocabPushdownMax", "65536")
    /** Stupid-backoff train-slice modulus (`spark.graft.ppl.sboTrainMod`):
      * the trigram LM's counts come from the doc_id % mod == 0 slice only,
      * so scoring the rest exercises real backoff (mod = 1 trains on the
      * full corpus — every observed n-gram then hits the trigram level).
      */
    def pplSboTrainMod: Int = positive("spark.graft.ppl.sboTrainMod", "2")
    /** Stupid-backoff multiplier as integer percent
      * (`spark.graft.ppl.sboAlphaPct`, Brants et al. 2007's α = 0.4 →
      * 40). 1..99; its frozen 6-dp natural log is printed into BOTH
      * engines' plans from the same Scala double.
      */
    def pplSboAlphaPct: Int = {
      val v = positive("spark.graft.ppl.sboAlphaPct", "40")
      require(v <= 99, s"spark.graft.ppl.sboAlphaPct must be <= 99, got $v")
      v
    }
    /** Kneser-Ney absolute discount as integer percent
      * (`spark.graft.ppl.knDiscountPct`, the standard D = 0.75 → 75).
      * 1..99 so `max(c − D, 0) = c − D` for every observed bigram; the
      * double is printed into BOTH engines' plans from the same Scala
      * value.
      */
    def pplKnDiscountPct: Int = {
      val v = positive("spark.graft.ppl.knDiscountPct", "75")
      require(v <= 99, s"spark.graft.ppl.knDiscountPct must be <= 99, got $v")
      v
    }
    /** Temperature-mix exponent as sqrt applications
      * (`spark.graft.mix.tempSqrts`): alpha = 2^-s, i.e. 1 → sqrt (0.5),
      * 2 → fourth root (0.25). Restricted to this family because sqrt is
      * the one power primitive IEEE guarantees correctly rounded — an
      * arbitrary pow() can differ in the last ulp across libm
      * implementations and flip a sampling decision (§5).
      */
    def mixTempSqrts: Int = positive("spark.graft.mix.tempSqrts", "1")
    /** Winnowing gram width in words (`spark.graft.winnow.k`): noise
      * threshold — matches shorter than k words are never seen.
      */
    def winnowK: Int = positive("spark.graft.winnow.k", "4")
    /** Winnowing window in grams (`spark.graft.winnow.w`): guarantee
      * threshold — any exact match of ≥ w+k-1 words shares a fingerprint.
      */
    def winnowW: Int = positive("spark.graft.winnow.w", "5")
    /** Hot-fingerprint cap (`spark.graft.winnow.fpCap`): fingerprints
      * shared by more docs than this (boilerplate phrases) are dropped
      * from pair generation — the band-join cap discipline.
      */
    def winnowFpCap: Int = positive("spark.graft.winnow.fpCap", "16")
    /** Winnow-containment dedup threshold in percent
      * (`spark.graft.winnow.tauPct`): a doc pair is a containment dup when
      * shared fingerprints ≥ tauPct% of the SMALLER doc's fingerprint set
      * (Broder containment, estimated on the winnow sample) — catches
      * doc-in-doc duplication whole-doc Jaccard structurally misses.
      * Integer percent so the threshold compare is exact cross-engine.
      */
    def winnowTauPct: Int = positive("spark.graft.winnow.tauPct", "50")
    /** Gopher word-count floor (`spark.graft.gopher.minWords`) — production
      * recipe 50 (Rae et al. 2021 A1.1), default scaled to the short
      * synthetic docs.
      */
    def gopherMinWords: Int = positive("spark.graft.gopher.minWords", "10")
    /** Gopher word-count ceiling (`spark.graft.gopher.maxWords`) —
      * production recipe 100,000.
      */
    def gopherMaxWords: Int = positive("spark.graft.gopher.maxWords", "1000")
    /** Gopher "must contain ≥ 2 of" stop list
      * (`spark.graft.gopher.stops`): the production recipe is Gopher's 8
      * function words (the,be,to,of,and,that,have,with — Rae et al. 2021
      * A1.1); the default scales to the synthetic corpus's vocabulary,
      * which carries only `the`/`a` as function words.
      */
    def gopherStops: Seq[String] = {
      val stops = get("spark.graft.gopher.stops", "the,a").split(",").toSeq
      require(stops.nonEmpty && stops.forall(_.matches("[A-Za-z]+")),
        s"spark.graft.gopher.stops must be comma-separated alphabetic words, got: ${stops.mkString(",")}")
      stops
    }

    /** NB classifier held-out modulus (`spark.graft.nb.evalMod`): docs
      * with `doc_id % evalMod == 0` are scored, the rest train.
      */
    def nbEvalMod: Int = positive("spark.graft.nb.evalMod", "4")

    /** Trained language-ID held-out modulus
      * (`spark.graft.langid.evalMod`) — `lang_id_nb`'s train/score split,
      * independent of the word-grain classifier's so the two sweeps can
      * move separately.
      */
    def langIdEvalMod: Int = positive("spark.graft.langid.evalMod", "4")

    /** Trained quality-classifier held-out modulus
      * (`spark.graft.qnb.evalMod`) — `quality_classifier_nb`'s
      * train/score split; 5 by default so the slice decorrelates from the
      * other NB sweeps' `% 4` carving.
      */
    def qnbEvalMod: Int = positive("spark.graft.qnb.evalMod", "5")
    /** Integer-composite label threshold for `quality_classifier_nb`
      * (`spark.graft.qnb.tauQint`): docs with
      * `qualityIntScoreOf >= tau` are labeled `hi`, the rest `lo` —
      * 64000 is the shipped corpus's median composite, so both classes
      * are populated at every sf. A deployment sets this to ITS rule
      * set's chosen bar (the teacher the classifier distills).
      */
    def qnbTauQint: Int = positive("spark.graft.qnb.tauQint", "64000")
    /** Calibration-report bucket width for `qnb_calibration_report`
      * (`spark.graft.qnb.calBucketMicro`): per-in-vocab-token NB score
      * margin, in micro-log units, per bucket — 5000 = five milli-nats of
      * log-odds per token per bucket (the shipped corpus's margins spread
      * across the 0..9 range at this width); buckets clamp at 9.
      */
    def qnbCalBucketMicro: Long =
      positive("spark.graft.qnb.calBucketMicro", "12000").toLong
    /** Quarantine threshold in calibration buckets for `qnb_quarantine`
      * (`spark.graft.qnb.quarantineBucket`): crawl docs whose NB margin
      * bucket (same integer bucketing as `qnb_calibration_report`) is
      * BELOW this go to the quarantine split instead of train;
      * abstentions (bucket −1, no in-vocab token or fewer than two
      * scored classes) always quarantine. 0..9; a deployment reads the
      * calibration report and sets the bar where accuracy clears its
      * tolerance.
      */
    def qnbQuarantineBucket: Long = {
      val v = get("spark.graft.qnb.quarantineBucket", "2")
      val n = try v.toLong catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"spark.graft.qnb.quarantineBucket must be an integer 0..9, got '$v'", e)
      }
      require(n >= 0 && n <= 9,
        s"spark.graft.qnb.quarantineBucket must be 0..9, got $n")
      n
    }

    /** Bench-session artifact root (`spark.graft.bench.artifactDir`):
      * when set, delta operators read their stored base artifacts
      * (the unified cluster membership) from parquet pre-built ONCE
      * under this directory instead of rebuilding them in-query, so the
      * bench board measures the per-crawl cost model the incremental
      * operators claim. PLAN-ONLY by construction: the artifact is the
      * same membership table the in-query build produces (its parquet
      * round-trip is spec-proven), so results are identical either way.
      * Unset by default; Verify never sets it. Bench salts it per JVM so
      * a stale artifact from an earlier session can never be read.
      */
    def benchArtifactDir: Option[String] = {
      val v = get("spark.graft.bench.artifactDir", "")
      if (v.isEmpty) None else Some(v)
    }

    /** Longest candidate subword piece for the unigram-LM tokenizer
      * (`spark.graft.unigram.maxPiece`).
      */
    def unigramMaxPiece: Int = positive("spark.graft.unigram.maxPiece", "4")
    /** Multi-char seed pieces kept, by weighted substring frequency
      * (`spark.graft.unigram.seedK`); single chars always survive for
      * coverage. Production sizes this ~vocab_budget × m (Kudo 2018's
      * seed heuristic).
      */
    def unigramSeedK: Int = positive("spark.graft.unigram.seedK", "64")
    /** Longest word the Viterbi unroll covers
      * (`spark.graft.unigram.maxWordLen`) — the generated DP chain has
      * one stage per position, so this is a PLAN-SIZE knob, not a data
      * truncation: longer words are excluded loudly, and production
      * sizes it to its corpus's word-length ceiling.
      */
    def unigramMaxWordLen: Int = positive("spark.graft.unigram.maxWordLen", "12")
    /** Retrain-alarm threshold in basis points for the tokenizer-store
      * drift report (`spark.graft.unigram.driftTauBp`): a source whose
      * crawl fertility under the STORED vocabulary exceeds the
      * retrained-vocabulary fertility by ≥ τ bp — or whose stored-vocab
      * coverage falls ≥ τ bp short of full — flags for retraining.
      */
    def unigramDriftTauBp: Int = positive("spark.graft.unigram.driftTauBp", "200")

    // -- DSIR data-selection knobs --
    /** Hashed-bigram feature buckets (`spark.graft.dsir.buckets`) — the
      * paper's hashed n-gram dimensionality; the bucket table is at most
      * this many rows, always broadcastable.
      */
    def dsirBuckets: Int = positive("spark.graft.dsir.buckets", "4096")
    /** Documents selected from the pool (`spark.graft.dsir.budget`). */
    def dsirBudget: Int = positive("spark.graft.dsir.budget", "50")
    /** Target-distribution slice: docs with this `lang` value
      * (`spark.graft.dsir.targetLang`). Interpolated into generated SQL,
      * so word characters only.
      */
    def dsirTargetLang: String = {
      val v = get("spark.graft.dsir.targetLang", "de")
      require(v.matches("[A-Za-z0-9_]+"),
        s"spark.graft.dsir.targetLang must be word characters, got: $v")
      v
    }

    /** Total training-token budget for `token_budget_sample`
      * (`spark.graft.budget.tokens`), split across sources by the
      * domain-mix weights.
      */
    def budgetTokens: Long = positive("spark.graft.budget.tokens", "4200").toLong

    /** Per-host document cap for `host_cap_sample`
      * (`spark.graft.curation.hostCap`): at most this many documents
      * survive per source host before the dedup lanes run.
      */
    def hostCap: Int = positive("spark.graft.curation.hostCap", "12")

    /** URL substring blocklist for `UrlFilter`
      * (`spark.graft.url.blockWords`, comma-separated, matched on the
      * lowercased URL). The default is the small high-precision core of
      * the public C4 list; production swaps in the full list.
      */
    def urlBlockWords: Seq[String] =
      get("spark.graft.url.blockWords", "porn,xxx,casino,viagra,escort,gambling")
        .split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).toSeq

    /** Maximum URL length for `UrlFilter` (`spark.graft.url.maxLen`). */
    def urlMaxLen: Int = positive("spark.graft.url.maxLen", "2048")

    /** Binary-quantization candidate pool per query
      * (`spark.graft.ann.bqRerank`): the exact re-rank touches this many
      * Hamming-nearest raw vectors per query.
      */
    def annBqRerank: Int = positive("spark.graft.ann.bqRerank", "64")

    /** MMR trade-off in integer percent (`spark.graft.mmr.lambdaPct`):
      * the selection score is `lambdaPct·rel − (100−lambdaPct)·maxsim`
      * over 4-dp-scaled integer cosines — integer so the greedy argmax
      * can never float-flip between engines.
      */
    def mmrLambdaPct: Int = {
      val v = positive("spark.graft.mmr.lambdaPct", "70")
      require(v <= 100, s"spark.graft.mmr.lambdaPct must be <= 100, got $v")
      v
    }
    /** MMR candidate pool per query (`spark.graft.mmr.depth`): the greedy
      * re-rank selects topK of these relevance-ranked candidates.
      */
    def mmrDepth: Int = positive("spark.graft.mmr.depth", "10")

    /** Novelty-audit n-gram width in words (`spark.graft.novelty.ngram`). */
    def noveltyNgram: Int = positive("spark.graft.novelty.ngram", "3")
    /** Novelty-audit crawl split (`spark.graft.novelty.mod`): docs with
      * `doc_id % mod == 0` are the NEW crawl scored against the rest —
      * the `dedup_delta` carving convention.
      */
    def noveltyMod: Int = positive("spark.graft.novelty.mod", "10")

    // -- quality-filter bounds (integer percents: thresholds compare as
    //    exact integer cross-multiplies in both engines, never a float) --
    /** Minimum words per document (`spark.graft.quality.minWords`). */
    def qualityMinWords: Int = positive("spark.graft.quality.minWords", "20")
    /** Maximum words per document (`spark.graft.quality.maxWords`). */
    def qualityMaxWords: Int = positive("spark.graft.quality.maxWords", "80")
    /** Stopword floor, percent (`spark.graft.quality.minStopPct`). */
    def qualityMinStopPct: Int = positive("spark.graft.quality.minStopPct", "1")
    /** Top-bigram repetition ceiling, percent
      * (`spark.graft.quality.maxTopBigramPct`).
      */
    def qualityMaxTopBigramPct: Int = positive("spark.graft.quality.maxTopBigramPct", "10")

    // -- line-grain quality rules (C4 terminal-punctuation / min-words /
    //    brace-and-javascript drops; Gopher bullet-start and ellipsis-end
    //    document ratios) — same integer-percent discipline --
    /** Minimum words for a line to be kept (`spark.graft.quality.lineMinWords`,
      * C4 §2.2 uses 3 in its word-count rule family).
      */
    def qualityLineMinWords: Int = positive("spark.graft.quality.lineMinWords", "3")
    /** Percent of lines starting with a bullet above this ⇒ listing page,
      * not prose (`spark.graft.quality.maxBulletPct`, Gopher A1.1 uses 90).
      */
    def qualityMaxBulletPct: Int = positive("spark.graft.quality.maxBulletPct", "90")
    /** Percent of lines ending in an ellipsis above this ⇒ truncated
      * teaser page (`spark.graft.quality.maxEllipsisPct`, Gopher uses 30).
      */
    def qualityMaxEllipsisPct: Int = positive("spark.graft.quality.maxEllipsisPct", "30")

    // -- HTML boilerplate rung at the WARC bridge (jusText-lite) --
    /** Prune link-dominated short paragraphs during `Warc.toDocuments`
      * (`spark.graft.html.boilerplate`), default off — the bridge's
      * paragraph grammar is bit-stable unless a deployment opts in.
      */
    def htmlBoilerplate: Boolean =
      get("spark.graft.html.boilerplate", "false").toBoolean
    /** Anchor-character percent above which a short paragraph counts as
      * navigation chrome (`spark.graft.html.maxLinkPct`).
      */
    def htmlMaxLinkPct: Int = {
      val v = positive("spark.graft.html.maxLinkPct", "40")
      require(v <= 100, s"spark.graft.html.maxLinkPct must be <= 100, got $v")
      v
    }
    /** Word-count ceiling under which a link-dominated paragraph drops
      * (`spark.graft.html.shortWords`); longer paragraphs always survive.
      */
    def htmlShortWords: Int = positive("spark.graft.html.shortWords", "10")
  }

  /** Session-lifetime registry of persisted operator intermediates. An
    * operator pins a DataFrame that its plan references more than once
    * (dedup signature tables, the trained IVF quantizer); the session
    * releases everything after the terminal action via
    * [[Dedup.releaseIntermediates]] (the name Verify/Bench already call).
    * Level from `spark.graft.dedup.storageLevel` (default MEMORY_AND_DISK;
    * 100 TB deployments set DISK_ONLY so wide intermediates never compete
    * with shuffle memory).
    */
  private[graft] object Intermediates {
    private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    def persist(df: DataFrame): DataFrame = {
      val lvl = df.sparkSession.conf.get("spark.graft.dedup.storageLevel", "MEMORY_AND_DISK")
      val p = df.persist(org.apache.spark.storage.StorageLevel.fromString(lvl))
      live.add(p)
      p
    }

    def release(): Unit = {
      var d = live.poll()
      while (d != null) { d.unpersist(blocking = false); d = live.poll() }
    }
  }

  /** `contractOrderBy` = `orderBy` that exists only for the contract layer.
    * Used ONLY where ordering is presentation (stable output for hashing) —
    * never where it is semantic (top-k `orderBy(...).limit(n)` keeps plain
    * `orderBy`).
    */
  implicit class ContractOrderOps(private val df: DataFrame) extends AnyVal {
    private def ordered: Boolean =
      df.sparkSession.conf.get(OrderedOutputKey, "true").toBoolean
    def contractOrderBy(sortCol: String, sortCols: String*): DataFrame =
      if (ordered) df.orderBy(sortCol, sortCols: _*) else df
    def contractOrderBy(sortExprs: Column*): DataFrame =
      if (ordered) df.orderBy(sortExprs: _*) else df
  }
}
