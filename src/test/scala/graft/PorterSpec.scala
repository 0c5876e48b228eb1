package graft

import graft.functions.Porter
import graft.ops.{PorterTextCleaner, RegexTextCleaner, TextClean}
import org.apache.spark.sql.functions.col

class PorterSpec extends SparkTestBase {
  import spark.implicits._

  /** Canonical vectors from the published algorithm's own worked examples
    * (Porter 1980 §§2-6) — every step exercised.
    */
  private val canonical = Seq(
    // step 1a: plurals
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b: -eed / -ed / -ing (+ cleanup rules)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c: y → i
    "happy" -> "happi", "sky" -> "sky",
    // step 2: double suffixes
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("canonical Porter vectors (published worked examples)") {
    for ((in, want) <- canonical)
      assert(Porter.stem(in) === want, s"stem($in)")
  }

  test("lemma-divergent fixtures: regular inflections normalize like spaCy") {
    // the wordcloud-visible wins: inflected forms that previously stayed
    // distinct from their lemma now collapse onto one stem
    assert(Porter.stem("running") === "run")
    assert(Porter.stem("runs") === "run")
    assert(Porter.stem("run") === "run")
    assert(Porter.stem("meetings") === Porter.stem("meeting")) // both "meet"
    assert(Porter.stem("connected") === Porter.stem("connection")) // both "connect"
    assert(Porter.stem("argued") === Porter.stem("argues")) // both "argu"
  }

  test("documented spaCy divergences hold (suffix stripper, not lemmatizer)") {
    // see Porter scaladoc — these are the KNOWN gaps, asserted so the doc
    // can't silently rot
    assert(Porter.stem("studies") === "studi") // spaCy: study
    assert(Porter.stem("ran") === "ran") // spaCy: run (irregular)
    assert(Porter.stem("geese") === "gees") // spaCy: goose (irregular)
    assert(Porter.stem("better") === "better") // spaCy: well/good
  }

  test("guards: short words, non-alphabetic and null inputs pass through") {
    assert(Porter.stem("a") === "a")
    assert(Porter.stem("is") === "is")
    assert(Porter.stem("e4e") === "e4e")
    assert(Porter.stem(null) === null)
  }

  test("PorterTextCleaner = regex cleaner + per-token stemming; null → \"\"") {
    assert(PorterTextCleaner.clean("The cats were RUNNING, happily!") ===
      "the cat were run happili")
    assert(PorterTextCleaner.clean(null) === "")
    // tokenization agrees with the unstemmed cleaner
    assert(RegexTextCleaner.clean("a1b c").split(" ").length ===
      PorterTextCleaner.clean("a1b c").split(" ").length)
  }

  test("stemmedCleanExpr (codegen graft_stem) matches PorterTextCleaner") {
    graft.functions.VectorFunctions.register(spark)
    val texts = Seq(
      "The cats were RUNNING, happily!",
      "Conditional formatting; relational DATABASES are agreed upon.",
      "studies ran better 42 faster e4e",
      "")
    val got = texts.toDF("text")
      .select(TextClean.stemmedCleanExpr(col("text")).as("c"))
      .as[String].collect()
    assert(got.toSeq === texts.map(PorterTextCleaner.clean))
  }

  test("wordcloudText(stemmed = true) prefers retweeted text and stems it") {
    graft.functions.VectorFunctions.register(spark)
    val tweets = Seq(
      ("original running text", Some("retweeted meetings text")),
      ("standalone studies", None))
      .toDF("text", "rt_text")
      .select(col("text"),
        org.apache.spark.sql.functions.struct(col("rt_text").as("text")).as("retweeted_status"))
    val got = TextClean.wordcloudText(tweets, stemmed = true)
      .as[String].collect().sorted
    assert(got.toSeq === Seq("retweet meet text", "standalon studi"))
  }
}
