package graft.synth

/** Deterministic sample generation for a practical regex subset — the
  * synthesis counterpart of `str_matches`/`str_contains` checks
  * (reference: strategies/pandas_strategies.py:1080 st.from_regex /
  * :1101 contains). The reference delegates to hypothesis' full regex
  * engine on the driver; here the pattern is parsed ONCE into an AST on
  * the driver and sampled per row inside a deterministic distributed
  * function, so synthesis parallelism is unchanged.
  *
  * Supported: literals, escapes (\d \w \s \. \\ ...), `.`, character
  * classes with ranges `[a-z0-9_]`, groups `(...)`/`(?:...)`,
  * alternation `|`, quantifiers `* + ? {m} {m,n} {m,}` (unbounded reps
  * capped at +4), anchors `^ $` (stripped). Unsupported constructs
  * (negated classes, backrefs, lookarounds) fail fast at schema-synthesis
  * time with a clear error — never silently ignored (the round-1 gap).
  */
object RegexGen {

  sealed trait Node extends Serializable
  final case class Lit(s: String) extends Node
  final case class Chars(cs: IndexedSeq[Char]) extends Node
  final case class Cat(ns: List[Node]) extends Node
  final case class Alt(ns: List[Node]) extends Node
  final case class Rep(n: Node, min: Int, max: Int) extends Node

  private val digits = ('0' to '9').toIndexedSeq
  private val word = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '_').toIndexedSeq
  private val space = IndexedSeq(' ', '\t')
  private val anyCh = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ ' ').toIndexedSeq

  def parse(pattern: String): Node = {
    val p = new Parser(pattern)
    val n = p.parseAlt()
    if (!p.atEnd) p.fail(s"unexpected '${p.peek}'")
    n
  }

  private final class Parser(pat: String) {
    private var i = 0
    def atEnd: Boolean = i >= pat.length
    def peek: Char = pat.charAt(i)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"regex synthesis: $msg at index $i in '$pat'")

    def parseAlt(): Node = {
      val first = parseCat()
      if (!atEnd && peek == '|') {
        val branches = scala.collection.mutable.ListBuffer(first)
        while (!atEnd && peek == '|') { i += 1; branches += parseCat() }
        Alt(branches.toList)
      } else first
    }

    def parseCat(): Node = {
      val parts = scala.collection.mutable.ListBuffer.empty[Node]
      while (!atEnd && peek != '|' && peek != ')') parts += parseQuant()
      if (parts.size == 1) parts.head else Cat(parts.toList)
    }

    private def parseQuant(): Node = {
      val atom = parseAtom()
      if (atEnd) return atom
      peek match {
        case '*' => i += 1; Rep(atom, 0, 4)
        case '+' => i += 1; Rep(atom, 1, 4)
        case '?' => i += 1; Rep(atom, 0, 1)
        case '{' =>
          val close = pat.indexOf('}', i)
          if (close < 0) fail("unclosed {")
          val body = pat.substring(i + 1, close)
          i = close + 1
          val parts = body.split(",", -1)
          try parts match {
            case Array(m) => val n = m.trim.toInt; Rep(atom, n, n)
            case Array(m, "") => val lo = m.trim.toInt; Rep(atom, lo, lo + 4)
            case Array(m, n) => Rep(atom, m.trim.toInt, n.trim.toInt)
            case _ => fail(s"bad quantifier {$body}")
          } catch { case _: NumberFormatException => fail(s"bad quantifier {$body}") }
        case _ => atom
      }
    }

    private def parseAtom(): Node = peek match {
      case '(' =>
        i += 1
        if (!atEnd && peek == '?') {
          if (i + 1 < pat.length && pat.charAt(i + 1) == ':') i += 2
          else fail("only (?:...) groups supported")
        }
        val inner = parseAlt()
        if (atEnd || peek != ')') fail("unclosed (")
        i += 1
        inner
      case '[' => parseClass()
      case '\\' => i += 1; parseEscape()
      case '.' => i += 1; Chars(anyCh)
      case '^' if i == 0 => // leading anchor: no-op
        i += 1
        if (atEnd || peek == '|' || peek == ')') Lit("") else parseAtom()
      case '$' if i == pat.length - 1 => i += 1; Lit("")
      case '^' | '$' => fail("mid-pattern anchors unsupported")
      case '*' | '+' | '?' | '{' => fail("dangling quantifier")
      case c => i += 1; Lit(c.toString)
    }

    private def parseEscape(): Node = {
      if (atEnd) fail("dangling backslash")
      val c = peek; i += 1
      c match {
        case 'd' => Chars(digits)
        case 'w' => Chars(word)
        case 's' => Chars(space)
        case 'D' | 'W' | 'S' | 'b' | 'B' => fail(s"\\$c unsupported")
        case 'n' => Lit("\n")
        case 't' => Lit("\t")
        case other => Lit(other.toString) // \. \\ \+ \[ ...
      }
    }

    private def parseClass(): Node = {
      i += 1 // consume [
      if (!atEnd && peek == '^') fail("negated classes unsupported")
      val cs = scala.collection.mutable.ArrayBuffer.empty[Char]
      while (!atEnd && peek != ']') {
        if (peek == '\\') {
          i += 1
          if (atEnd) fail("dangling backslash in class")
          peek match {
            case 'd' => cs ++= digits
            case 'w' => cs ++= word
            case 's' => cs ++= space
            case o => cs += o
          }
          i += 1
        } else if (i + 2 < pat.length && pat.charAt(i + 1) == '-' &&
                   pat.charAt(i + 2) != ']') {
          val lo = peek; val hi = pat.charAt(i + 2)
          if (lo > hi) fail(s"bad range $lo-$hi")
          cs ++= (lo to hi)
          i += 3
        } else { cs += peek; i += 1 }
      }
      if (atEnd) fail("unclosed [")
      i += 1 // consume ]
      if (cs.isEmpty) fail("empty class")
      Chars(cs.distinct.toIndexedSeq)
    }
  }

  /** One sample matching the AST, deterministic in `rnd`. */
  def sample(node: Node, rnd: java.util.Random): String = node match {
    case Lit(s) => s
    case Chars(cs) => cs(rnd.nextInt(cs.size)).toString
    case Cat(ns) => ns.map(sample(_, rnd)).mkString
    case Alt(ns) => sample(ns(rnd.nextInt(ns.size)), rnd)
    case Rep(n, lo, hi) =>
      val k = lo + (if (hi > lo) rnd.nextInt(hi - lo + 1) else 0)
      (0 until k).map(_ => sample(n, rnd)).mkString
  }
}
