package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression applying deterministic greedy BPE (byte-pair
  * encoding) to every word of an `array<string>` words column, returning the
  * flattened token array (word order preserved; merges never cross a word
  * boundary).
  *
  * Semantics — exact and engine-portable, replayed verbatim by the DuckDB
  * recursive-CTE oracle (graft.text.Bpe.oracleCtes):
  *   1. a word starts as its character sequence;
  *   2. repeatedly, among all ADJACENT token pairs present in the merges
  *      list, merge the one with the LOWEST rank; on multiple occurrences
  *      of that pair, merge the LEFTMOST; stop when no adjacent pair is in
  *      the list.
  * One-merge-at-a-time with global-min-rank-then-leftmost selection is
  * equivalent to the classic "merge all occurrences of the best pair per
  * round" formulation (GPT-2 bpe) whenever the merges list is a valid BPE
  * merge table (each side of a pair is a base character or the product of
  * an EARLIER merge): decomposing a round into single merges can only
  * create pairs involving the just-merged token, whose ranks are by
  * validity strictly higher than the pair being merged, so the running
  * minimum never changes mid-round. The one-at-a-time form is what both
  * engines execute, so equivalence with the oracle holds by construction
  * even for invalid merge tables.
  *
  * `merges` must be a FOLDABLE array<string> of "left right" pairs in rank
  * order (rank = position) — the tokenizer model is part of the plan, like
  * the reference's properties-file query parameters (daas-apps
  * sparkcaller/README.md's toolpath/known-sites config analog), and is
  * typically tens of thousands of entries: driver-side literal, never a
  * join. Per-row cost is O(len²·merges-applied) worst case on short word
  * lengths — map-only, no shuffle, scale-linear in corpus size.
  *
  * CodegenFallback for the same reason as [[MinHashSignature]]: the eval
  * is already a tight JVM loop over small arrays; a per-task memoization
  * cache (words repeat heavily in any natural corpus — the GPT-2 tokenizer
  * caches identically) removes the loop from the hot path entirely.
  */
final case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "bpe_encode merges must be a foldable array<string> literal")
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_encode needs (array<string> words, array<string> merges), got $other")
    }
  }

  /** rank of "left right" → 0-based position; built once per task from the
    * foldable merges child.
    */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val pair = arr.getUTF8String(i).toString
      // first occurrence wins, matching list_position in the oracle
      if (!m.containsKey(pair)) m.put(pair, i)
      i += 1
    }
    m
  }

  /** Per-task word → tokens memo (bounded: natural-language corpora have
    * vocab ≪ corpus, but the bound keeps adversarial inputs from growing
    * the heap). Cleared, not LRU — eval is single-threaded per task.
    */
  @transient private lazy val cache = new java.util.HashMap[String, Array[UTF8String]]()
  private final val CacheMax = 1 << 16

  private def encodeWord(word: String): Array[UTF8String] = {
    val cached = cache.get(word)
    if (cached != null) return cached
    // split into Unicode CODE POINTS, not UTF-16 code units: the oracle's
    // substr(w, i, 1) is code-point based, and a lone surrogate half is
    // not a valid token (or valid UTF-8) — charAt would diverge on any
    // astral-plane character (emoji, CJK ext-B)
    var toks = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var idx = 0
    while (idx < word.length) {
      val cp = word.codePointAt(idx)
      toks(i) = new String(Character.toChars(cp))
      idx += Character.charCount(cp)
      i += 1
    }
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.get(toks(j) + " " + toks(j + 1))
        if (r != null && r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val merged = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, merged, 0, bi)
        merged(bi) = toks(bi) + toks(bi + 1)
        System.arraycopy(toks, bi + 2, merged, bi + 1, toks.length - bi - 2)
        toks = merged
        done = toks.length < 2
      }
    }
    val out = toks.map(UTF8String.fromString)
    if (cache.size >= CacheMax) cache.clear()
    cache.put(word, out)
    out
  }

  override def nullSafeEval(words: Any, merges: Any): Any = {
    val arr = words.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numBytes() > 0) out ++= encodeWord(w.toString)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {
  /** Column API: flattened BPE tokens of an array<string> words column
    * under a rank-ordered merges list. Resolves through the session
    * function registry — requires [[GraftExtensions]].
    */
  def of(words: Column, merges: Seq[String]): Column =
    call_function("bpe_encode", words, lit(merges.toArray))
}
