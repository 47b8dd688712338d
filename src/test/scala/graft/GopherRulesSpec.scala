package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Hand-constructed boundary cases for the Gopher rule battery — each
  * rule flipped independently, empty text, and the threshold edges of
  * the cross-multiplied integer comparisons.
  */
class GopherRulesSpec extends SparkSpec {

  import spark.implicits._

  private def rules(texts: String*): Seq[(Boolean, Boolean, Boolean, Boolean, Boolean)] =
    texts.toDF("text")
      .select(TextAnalysis.gopherRules(col("text"), minWords = 3, maxWords = 6).as("g"))
      .select("g.wc_ok", "g.wlen_ok", "g.sym_ok", "g.alpha_ok", "g.stop_ok")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq

  test("each rule flips independently at its boundary") {
    val Seq(ok, tooFew, tooMany, shortWords, longWords, symbols, numeric, noStop) =
      rules(
        "the nice tables stand for",     // 5 words, mean 4.2, stopwords the+for
        "the cat",                        // 2 words < min 3
        "the a big cat sat on mat",       // 7 words > max 6
        "a is to it the for",             // mean word length 2 - below 4n
        "quantum mechanics the explains", // mean (7+9+3+8)/4=6.75 > 5n
        "### spark ### join the",         // 3 '#' words of 5 -> 9*10 > 15
        "111 222 333 the 555",            // 1 alpha word of 5: 5 < 4*5
        "spark join scan merge")          // zero stopword hits
    assert(ok == (true, true, true, true, true))
    assert(!tooFew._1 && tooFew._3)
    assert(!tooMany._1)
    assert(ok._2 && !shortWords._2 && !longWords._2)
    assert(!symbols._3 && ok._3)
    assert(!numeric._4 && ok._4)
    assert(!noStop._5 && ok._5)
  }

  test("empty and blank text fail word-dependent rules deterministically") {
    val Seq(empty, blank) = rules("", "   ")
    assert(!empty._1 && !empty._2 && empty._3 && empty._4 && !empty._5)
    assert(empty == blank)
  }

  test("mean-word-length boundaries are inclusive (4n <= sum <= 5n)") {
    // 3 words x 4 chars = mean exactly 4.0 -> pass; 3 x 5 = 5.0 -> pass
    val Seq(lo, hi) = rules("abcd abcd the!", "abcde abcde that!")
    assert(lo._2 && hi._2)
  }
}
