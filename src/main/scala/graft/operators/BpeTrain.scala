package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy byte-pair-encoding merge training — the tokenizer-training pass
  * a pretraining pipeline runs over its corpus before anything else
  * (Sennrich et al. 2016, public): repeatedly find the most frequent
  * adjacent symbol pair in the word vocabulary and fuse it into a new
  * symbol, emitting one merge rule per round.
  *
  * Scale shape (the 100 TB contract): the corpus is touched EXACTLY ONCE
  * — a normalize → split → word-count groupBy (map-side combinable, one
  * shuffle on the word). Every merge round after that runs on the word
  * VOCABULARY, whose size is bounded by distinct words, not corpus bytes:
  * pair counting is a row-local `arrays_zip` fan-out ∝ each word's own
  * symbol count feeding a vocab-sized groupBy, the winning pair is a
  * 1-row broadcast (deterministic count-desc/pair-asc tie-break), and the
  * merge application is a row-local space-doubling `replace` sandwich —
  * double every delimiter, replace " l  r " with the fused symbol,
  * collapse doubles back — which is exactly BPE's greedy left-to-right
  * merge: consecutive occurrences (" a b a b ") all merge because each
  * symbol owns its delimiters after doubling, while overlapping ones
  * (" a a a " → " aa a ") correctly don't. Loop intermediates are
  * `localCheckpoint`ed per round (the dedup-clustering convention), so
  * round r's plan never re-derives rounds 1..r-1.
  *
  * Words are sentinel-framed as " c h a r s " so a merge rule " l l " can
  * only land on whole-symbol boundaries; merged symbols are multi-char
  * strings, which later rounds treat atomically via the space framing.
  */
object BpeTrain {

  /** Train `kRounds` BPE merges over `textCol`, normalized to lowercase
    * alphanumeric words (non-alnum → space).
    *
    * @return one row per merge round: (step, pair, merged, cnt), where
    *         `pair` is the space-separated winning pair, `merged` its
    *         fused symbol, and `cnt` its frequency at selection time.
    *         The returned plan is lazy over per-round checkpoints; the
    *         k training rounds execute at call time.
    */
  def bpeMerges(docs: DataFrame, textCol: String, kRounds: Int): DataFrame =
    train(docs, textCol, kRounds)._1

  /** Train merges AND return the trained word table — (merges,
    * vocab(word, sym, cnt)) where `sym` is the word's space-framed symbol
    * string AFTER all k merges. The vocab is what the encode pass joins
    * against: a word's encoded length is fully determined here, so
    * encoding a 100 TB corpus never replays merges per document.
    */
  def train(docs: DataFrame, textCol: String,
            kRounds: Int): (DataFrame, DataFrame) = {
    require(kRounds >= 1, s"kRounds must be >= 1, got $kRounds")
    // FanOut: the lowercase/regex/explode word kernel fused into a
    // single-row-group scan otherwise runs single-task (Profile r15)
    val words = FanOut.bySize(docs, col(textCol))
      .select(explode(split(regexp_replace(lower(col(textCol)),
        "[^a-z0-9 ]", " "), " ")).as("_bpe_w"))
      .filter(col("_bpe_w") =!= "")
      .groupBy(col("_bpe_w")).agg(count(lit(1)).as("cnt"))
    // the loop seed: one corpus pass, then the corpus is never read again
    var vocab = words
      .select(col("_bpe_w"),
        concat(lit(" "), concat_ws(" ", split(col("_bpe_w"), "")), lit(" "))
          .as("sym"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[DataFrame]
    for (step <- 1 to kRounds) {
      val s = split(trim(col("sym")), " ")
      val n = size(col("_bpe_s"))
      val best = vocab
        .select(col("cnt"), s.as("_bpe_s"))
        .select(col("cnt"), explode(arrays_zip(
          slice(col("_bpe_s"), lit(1), greatest(n - 1, lit(0))).as("l"),
          slice(col("_bpe_s"), lit(2), greatest(n - 1, lit(0))).as("r"))).as("_bpe_p"))
        .select(concat(col("_bpe_p.l"), lit(" "), col("_bpe_p.r")).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(col("pair").as("_bpe_bp"), col("cnt").as("_bpe_bc"))
        .localCheckpoint()
      merges += best.select(lit(step).cast("long").as("step"),
        col("_bpe_bp").as("pair"),
        regexp_replace(col("_bpe_bp"), " ", "").as("merged"),
        col("_bpe_bc").as("cnt"))
      vocab = vocab.crossJoin(broadcast(best))
        .select(col("_bpe_w"), expr(
          "replace(replace(replace(sym, ' ', '  '), " +
            "' ' || replace(_bpe_bp, ' ', '  ') || ' ', " +
            "' ' || replace(_bpe_bp, ' ', '') || ' '), '  ', ' ')").as("sym"),
          col("cnt"))
        .localCheckpoint()
    }
    (merges.result().reduce(_.unionAll(_)), vocab)
  }

  /** Encode the corpus with the trained merges: per-doc BPE token count.
    *
    * Scale shape: a word's post-merge symbol count is a VOCAB property,
    * so the encode is one corpus pass (normalize → per-doc word counts,
    * map-side combinable) joined against the trained vocab on the word —
    * no per-document merge replay, no state beyond the vocab. Docs with
    * no alnum words keep (0, 0).
    *
    * @return one row per doc: (idCol, n_words, n_tokens), n_tokens the
    *         total BPE symbol count under the trained merges.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                kRounds: Int): DataFrame = {
    val vocab = train(docs, textCol, kRounds)._2
      .select(col("_bpe_w"),
        size(split(trim(col("sym")), " ")).as("_bpe_n"))
    val perWord = FanOut.bySize(docs, col(idCol))
      .select(col(idCol), explode(split(regexp_replace(lower(col(textCol)),
        "[^a-z0-9 ]", " "), " ")).as("_bpe_w"))
      .filter(col("_bpe_w") =!= "")
      .groupBy(col(idCol), col("_bpe_w")).agg(count(lit(1)).as("_bpe_c"))
    val perDoc = perWord.join(vocab, "_bpe_w")
      .groupBy(col(idCol))
      .agg(sum(col("_bpe_c")).as("n_words"),
        sum(col("_bpe_c") * col("_bpe_n")).as("n_tokens"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
