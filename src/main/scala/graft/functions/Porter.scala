package graft.functions

/** The Porter stemming algorithm (M. F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — public-domain algorithm and reference
  * implementations). Used as the JVM stand-in for the reference's spaCy
  * lemmatizer (D6, `bigdata/__init__.py:31-47`): spaCy does not exist on
  * the JVM, and Porter is the closest public, deterministic, dependency-
  * free normalizer.
  *
  * Includes the two departures Porter folded into every distributed
  * reference implementation (step 2: `bli`→`ble` instead of `abli`→`able`;
  * the added `logi`→`log` rule), so output matches the canonical
  * vocabulary test set.
  *
  * DOCUMENTED DIVERGENCE from spaCy lemmatization (see also
  * [[graft.ops.TextClean]]): Porter is a suffix STRIPPER, not a
  * dictionary lemmatizer —
  *   - stems need not be words: "studies"→"studi" (spaCy: "study"),
  *     "happiness"→"happi" (spaCy: "happiness"), "argue"→"argu";
  *   - irregular forms don't normalize: "ran"→"ran" (spaCy: "run"),
  *     "geese"→"gees" (spaCy: "goose"), "better"→"better" (spaCy:
  *     "well"/"good");
  *   - spaCy's `-PRON-` pronoun token has no analogue — pronouns pass
  *     through as themselves;
  *   - POS-sensitive lemmas collapse: spaCy lemmatizes "meeting" (noun)
  *     to "meeting" but (verb) to "meet"; Porter always gives "meet".
  * What it DOES close: the regular inflections that dominate word-cloud
  * divergence ("running"→"run", "flies"→"fli"≈"fly", plural `-s`,
  * `-ed`/`-ing`, `-ational`/`-iveness`/`-ization` derivations).
  */
object Porter {

  /** UTF8String adapter for the codegen path ([[PorterStem]]) — one
    * eval-time allocation pair, no per-row lambda.
    */
  def stemUtf8(u: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val s = u.toString
    val out = stem(s)
    if (out eq s) u else org.apache.spark.unsafe.types.UTF8String.fromString(out)
  }

  /** Stem one lowercase alphabetic word. Words of length ≤ 2 and inputs
    * with non a-z chars are returned unchanged (the tokenizer upstream
    * guarantees lowercase alphabetic input; anything else is passed
    * through rather than corrupted).
    */
  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    val s = new Stemmer(word.toCharArray)
    s.run()
  }

  /** Mutable suffix-stripping state over a char buffer; `k` is the index
    * of the last live char, `j` the stem end set by `ends`. Direct port of
    * the algorithm's published structure.
    */
  private final class Stemmer(b: Array[Char]) {
    private var k = b.length - 1
    private var j = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** measure: number of consonant sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    /** true when b[i-1] == b[i] and both consonant. */
    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, last consonant not w/x/y —
      * the `*o` condition (restores the `e` in e.g. hop-ing → hope? no:
      * cav(e) → cav-ing → cave).
      */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      val l = s.length
      var i = 0
      while (i < l) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** step 1ab: plurals and -ed/-ing. */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** step 1c: y → i when the stem has a vowel. */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** step 2: double/triple suffixes → simpler form (m > 0). */
    private def step3(): Unit = {
      if (k == 0) return
      (b(k - 1): @annotation.switch) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // departure: paper has abli → able
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // departure: added after publication
        case _ => ()
      }
    }

    /** step 3: -ic-, -full, -ness etc. (m > 0). */
    private def step4(): Unit =
      (b(k): @annotation.switch) match {
        case 'e' =>
          if (ends("icate")) r("ic")
          else if (ends("ative")) r("")
          else if (ends("alize")) r("al")
        case 'i' =>
          if (ends("iciti")) r("ic")
        case 'l' =>
          if (ends("ical")) r("ic")
          else if (ends("ful")) r("")
        case 's' =>
          if (ends("ness")) r("")
        case _ => ()
      }

    /** step 4: strip -ant, -ence, ... when m > 1. */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = (b(k - 1): @annotation.switch) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** step 5ab: final -e and -ll cleanup. */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): String = {
      step1(); step2(); step3(); step4(); step5(); step6()
      new String(b, 0, k + 1)
    }
  }
}
