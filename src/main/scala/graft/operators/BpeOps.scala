package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols.normTokens

/** Byte-pair-encoding merge TRAINING (Sennrich et al. 2016) — the
  * tokenizer-learning pass itself, not just the pre-tokenizer piece
  * counts of `text_subword_stats`. Three merge rounds learned over
  * the corpus, each: count adjacent symbol pairs → pick the argmax →
  * greedily rewrite every word.
  *
  * Scale shape (the standard BPE trick, distributed): rounds operate
  * on the (word, count) VOCABULARY table, never the corpus — the
  * corpus is scanned ONCE into word frequencies, after which a round
  * costs one partial+final pair aggregation over the vocab plus a
  * map-side rewrite; the only driver traffic per round is the single
  * argmax row (TakeOrderedAndProject, not a global sort). At 100 TB
  * the vocab is millions of rows where the corpus is trillions —
  * that asymmetry is what makes BPE trainable at all.
  *
  * Determinism (why this has a full SQL-replay oracle): pair counts
  * are exact integers, the argmax tie-breaks on (count desc, left
  * asc, right asc), and the rewrite is the canonical GREEDY
  * LEFT-TO-RIGHT scan — a just-merged symbol never re-matches as the
  * left element unless it literally equals it — which both the Scala
  * UDF and the oracle's `list_reduce` fold implement identically.
  */
object BpeOps {
  import graft.SparkEntry.QueryFn

  val Rounds = 3

  /** Greedy left-to-right merge of adjacent (a, b) into a+b — the
    * exact fold the oracle replays with list_reduce. */
  private val mergePair: UserDefinedFunction =
    udf { (syms: Seq[String], a: String, b: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
        else out += x
      }
      out.toSeq
    }

  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      // sequence(1, 0) counts DOWN in Spark — single-symbol words
      // must not reach it (they carry no pairs anyway)
      .where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pc"))

  /** Argmax pair of a (syms, cnt) vocab — ONE row to the driver via
    * TakeOrderedAndProject, ties to the lexicographically first pair. */
  private[operators] def bestPair(vocab: DataFrame): org.apache.spark.sql.Row =
    pairCounts(vocab)
      .orderBy(col("pc").desc, col("a").asc, col("b").asc)
      .limit(1).head

  /** Map-side greedy rewrite of the vocab under one merge. */
  private[operators] def applyMerge(vocab: DataFrame, a: String, b: String): DataFrame =
    vocab.select(mergePair(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))

  /** (syms, cnt) vocabulary of any (doc_id, text) frame — the ONE
    * corpus-scale scan; everything after operates on this table. */
  private[operators] def charVocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(normTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))

  /** The learned merge table over any corpus frame. */
  private[operators] def trainMerges(docs: DataFrame)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab = charVocab(docs).transform(Pin.corpus)
    (1 to Rounds).map { rank =>
      val best = bestPair(vocab)
      val (a, b, pc) = (best.getString(0), best.getString(1), best.getLong(2))
      val prev = vocab
      vocab = applyMerge(vocab, a, b).transform(Pin.corpus)
      prev.unpersist()
      (rank.toLong, a, b, a + b, pc)
    }
  }

  /** The learned merge table: (rank, lhs, rhs, merged, pair_count)
    * after `Rounds` rounds. */
  val textBpeTrain: QueryFn = (s, dir) => {
    import s.implicits._
    trainMerges(Tables.documents(s, dir))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"rank")
  }

  /** BPE merge APPLICATION — the tokenizer's ENCODE pass, the other
    * half of the BPE lifecycle (train once ↑, encode every corpus
    * forever after). Each document's words are split to characters
    * and the learned merges are replayed in rank order with the same
    * greedy left-to-right fold as training; the output is the per-doc
    * token accounting a pipeline bills by (chars in → BPE symbols
    * out → how many merges fired → compression).
    *
    * Scale shape: training cost is the vocab-table loop above; the
    * ENCODE is pure map — `Rounds` chained per-row projections over
    * the corpus scan with zero shuffles before the final per-doc agg.
    * At 100 TB this is the shape that matters: a real 30k-merge
    * tokenizer compiles the merge table into one per-row automaton
    * (same fold, one pass), and the merge TABLE broadcasts — the
    * corpus never re-shuffles. Determinism is inherited from
    * training: exact-integer argmaxes pick the merges, and the fold
    * is replayed symbol-for-symbol by the oracle's list_reduce. */
  val textBpeEncode: QueryFn = (s, dir) => {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val merges = trainMerges(docs)
    val base = docs
      .select($"doc_id", explode(normTokens($"text")).as("w"))
      .select($"doc_id", split($"w", "").as("syms"))
      .select($"doc_id", size($"syms").cast("long").as("n_chars"), $"syms")
    val encoded = merges.foldLeft(base) { case (df, (_, a, b, _, _)) =>
      df.select($"doc_id", $"n_chars", mergePair($"syms", lit(a), lit(b)).as("syms"))
    }
    encoded
      .select($"doc_id", $"n_chars", size($"syms").cast("long").as("n_syms"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_chars").as("n_chars"),
        sum($"n_syms").as("n_tokens"))
      .select($"doc_id", $"n_words", $"n_chars", $"n_tokens",
        ($"n_chars" - $"n_tokens").as("n_merges"),
        graft.functions.Cols.rnd(
          $"n_tokens".cast("double") / $"n_chars", 6).as("compression"))
      .orderBy($"doc_id")
  }

  /** Tokenizer FERTILITY report — the per-language cost sheet a
    * training pipeline bills by (tokens per word, chars per token):
    * a tokenizer trained on one language mix systematically inflates
    * token counts on underrepresented languages (fertility is THE
    * standard cross-lingual tokenizer-equity metric), and token
    * budgets, packing, and compute cost all scale with it. Same
    * train+encode machinery as [[textBpeEncode]]; the fold to
    * per-language is one small join (per-doc accounting × doc lang)
    * plus an exact-integer aggregate — ratios divide ONCE at the end,
    * so the report hash-verifies.
    *
    * Scale shape: encode is map-only over the corpus scan (merges
    * broadcast); the report agg is |langs| rows. Docs with zero
    * normalized words carry no token accounting and are excluded —
    * consistently on both engines. */
  val qTokenizerFertility: QueryFn = (s, dir) => {
    import s.implicits._
    textBpeEncode(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("w"),
        sum($"n_tokens").as("t"),
        sum($"n_chars").as("c"))
      .select($"lang", $"n_docs", $"w".as("n_words"), $"t".as("n_tokens"),
        graft.functions.Cols.rnd(
          $"t".cast("double") / $"w".cast("double"), 6).as("fertility"),
        graft.functions.Cols.rnd(
          $"c".cast("double") / $"t".cast("double"), 6).as("chars_per_token"))
      .orderBy($"lang")
  }
}
