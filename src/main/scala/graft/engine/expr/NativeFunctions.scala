package graft.engine.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for hot-path vector math.
  *
  * The declarative form `aggregate(zip_with(a, b, multiply), sum)` is
  * semantically right but executes via interpreted lambda dispatch per
  * element — measurably slow when every candidate pair in an ANN/near-dup
  * query computes a 64-dim dot product. This BinaryExpression generates a
  * tight Java loop inside whole-stage codegen (SURVEY.md §4.3's "custom
  * Expression only where built-ins can't express it efficiently" case —
  * preference (b) before any UDF).
  */
object NativeFunctions {

  /** Exact BIGINT dot product of two array<bigint> columns (positions past
    * the shorter array ignored; inputs here are always equal-length).
    *
    * Overflow behavior follows `failOnError`, mirroring Spark's own
    * BinaryArithmetic: `false` wraps (LEGACY `*`/`+` semantics — safe for
    * the engine's quantized data, |q| <= ~2000 per component), `true`
    * raises Spark's ARITHMETIC_OVERFLOW (ANSI semantics) via
    * `MathUtils.multiplyExact`/`addExact`, so the expression is a faithful
    * substitute for the declarative HOF form in ANSI sessions too.
    */
  case class LongArrayDot(left: Expression, right: Expression,
      failOnError: Boolean = false)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"qdot_native expects (array<bigint>, array<bigint>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      if (failOnError) {
        while (i < n) {
          acc = MathUtils.addExact(acc,
            MathUtils.multiplyExact(x.getLong(i), y.getLong(i)))
          i += 1
        }
      } else {
        while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val mu = "org.apache.spark.sql.catalyst.util.MathUtils"
        val step =
          if (failOnError)
            s"$acc = $mu.addExact($acc, $mu.multiplyExact($a.getLong($i), $b.getLong($i)));"
          else
            s"$acc += $a.getLong($i) * $b.getLong($i);"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $step
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** The FULL SRP signature in one expression: bit p of the result is 1
    * iff Σ_i q(i) · coefs(p)(i) > 0 — `coefs.length` hyperplane dots in
    * one constant-size nested loop over a reference-object matrix.
    *
    * Exists because the declarative form — one chained
    * `CASE WHEN qdot(q, <64-literal array>) > 0 THEN 2^p` term per plane
    * — generates code LINEAR in the plane count, and at the sf10-derived
    * 44 planes the stage blows past Janino/JIT limits and silently falls
    * back to fully INTERPRETED evaluation (measured: the SRP occupancy
    * census, a linear projection+rollup, ran 43× sf1's time on 10× data;
    * with this expression the code size is constant at ANY plane count).
    * Overflow-free by construction: |dot| ≤ dims · 1000 ≪ 2^63.
    *
    * The coefficient matrix arrives as a FOLDABLE array<array<bigint>>
    * literal (builder evals it once at resolution, like RegexFindGroup
    * folds its pattern); the expression itself carries the primitive
    * long[][] into codegen via a reference object.
    */
  case class SrpSignature(child: Expression, coefs: Array[Array[Long]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(coefs.nonEmpty && coefs.length <= 63,
      s"srp_signature supports 1..63 planes, got ${coefs.length}")
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"srp_signature expects array<bigint>, got ${other.sql}")
      }

    override def nullSafeEval(a: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val n = q.numElements()
      var sig = 0L
      var p = 0
      while (p < coefs.length) {
        val row = coefs(p)
        val lim = math.min(n, row.length)
        var dot = 0L
        var i = 0
        while (i < lim) { dot += q.getLong(i) * row(i); i += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.addReferenceObj("srpCoefs", coefs, "long[][]")
        val sig = ctx.freshName("sig")
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val row = ctx.freshName("row")
        val lim = ctx.freshName("lim")
        s"""
           |long $sig = 0L;
           |int $n = $a.numElements();
           |for (int $p = 0; $p < ${coefs.length}; $p++) {
           |  long[] $row = $m[$p];
           |  int $lim = java.lang.Math.min($n, $row.length);
           |  long $dot = 0L;
           |  for (int $i = 0; $i < $lim; $i++) {
           |    $dot += $a.getLong($i) * $row[$i];
           |  }
           |  if ($dot > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Identity wrapper the optimizer cannot see through: evaluates exactly
    * like its child (same value, same nulls, same codegen) but reports
    * `deterministic = false`, which blocks the two rewrites that
    * otherwise DUPLICATE an expensive child expression:
    *  - PushDownPredicate: a filter conjunct that substitutes to a
    *    nondeterministic expression is never pushed, so routing-flag
    *    filters keep testing materialized attributes instead of
    *    re-deriving from_json/parity/line-render per conjunct inside an
    *    interpreted Filter (observed: 11 from_json copies in ONE pushed
    *    filter — Spark 4.1 constant-folds the old `when(rand() < 0, …)`
    *    barrier away, so this expression is the reliable replacement);
    *  - CollapseProject: nondeterministic multi-referenced aliases are
    *    never inlined into consumers.
    * Evaluation-identical, so oracle parity is untouched.
    */
  case class OpaqueBarrier(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override lazy val deterministic: Boolean = false
    override def foldable: Boolean = false
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fused `rlike` + `regexp_extract` in ONE regex execution: returns
    * group 1 of the first match (never null on a match — a
    * non-participating group yields "", exactly like `regexp_extract`),
    * or NULL when the pattern does not match. So
    * `rlike(p)` ≡ `regex_find_group(s, p) IS NOT NULL` and
    * `regexp_extract(s, p, 1)` ≡ `coalesce(regex_find_group(s, p), '')`
    * — one `Matcher.find()` where the MySQL slow-log parse battery
    * previously ran each pattern twice per entry (the suite's most
    * expensive honest query, and the 100 TB ingest hot path).
    *
    * The pattern must be a foldable literal with ≥1 capturing group
    * (compiled once per expression instance, shared by codegen via a
    * reference object — never recompiled per row).
    */
  case class RegexFindGroup(subject: Expression, regexp: Expression)
      extends BinaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    override def left: Expression = subject
    override def right: Expression = regexp
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    /** Pattern problems fail ANALYSIS, not mid-execution: an invalid
      * regex, a zero-capturing-group pattern, or a null literal each
      * produce a clear TypeCheckFailure here rather than a
      * PatternSyntaxException / require / NPE from the first evaluation
      * deep inside a running stage (ADVICE r10).
      */
    override def checkInputDataTypes(): TypeCheckResult =
      if (subject.dataType != StringType || regexp.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"${NativeFunctions.RegexFindName} expects (string, string), got " +
            s"(${subject.dataType.sql}, ${regexp.dataType.sql})")
      else if (!regexp.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"${NativeFunctions.RegexFindName} pattern must be a literal")
      else regexp.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          s"${NativeFunctions.RegexFindName} pattern must not be NULL")
        case p =>
          try {
            val compiled =
              java.util.regex.Pattern.compile(p.asInstanceOf[UTF8String].toString)
            if (compiled.matcher("").groupCount() < 1)
              TypeCheckResult.TypeCheckFailure(
                s"${NativeFunctions.RegexFindName} pattern has no capturing " +
                  s"group: $p")
            else TypeCheckResult.TypeCheckSuccess
          } catch {
            case e: java.util.regex.PatternSyntaxException =>
              TypeCheckResult.TypeCheckFailure(
                s"${NativeFunctions.RegexFindName} invalid pattern: " +
                  e.getMessage)
          }
      }

    // analysis (checkInputDataTypes above) has already validated the
    // pattern; this is the once-per-instance compile both eval paths share
    @transient private lazy val pattern: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(
        regexp.eval().asInstanceOf[UTF8String].toString)

    override def nullSafeEval(s: Any, p: Any): Any = {
      val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
      if (m.find()) {
        val g = m.group(1)
        UTF8String.fromString(if (g == null) "" else g)
      } else null
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val patRef = ctx.addReferenceObj("graftFindPattern", pattern,
        "java.util.regex.Pattern")
      nullSafeCodeGen(ctx, ev, (subj, _) => {
        val m = ctx.freshName("matcher")
        val g = ctx.freshName("group")
        s"""
           |java.util.regex.Matcher $m = $patRef.matcher($subj.toString());
           |if ($m.find()) {
           |  String $g = $m.group(1);
           |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |    $g == null ? "" : $g);
           |} else {
           |  ${ev.isNull} = true;
           |}
           |""".stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(subject = newLeft, regexp = newRight)
  }

  /** All seven MySQL slow-log field captures in ONE compiled pass — the
    * fused successor of running [[RegexFindGroup]] seven times per entry
    * (r16's `_stage_mysql_parsed` spent its build almost entirely in the
    * regex battery: 7 × `Matcher.find()` backtracking scans and 7 ×
    * `UTF8String.toString` copies of the same multi-hundred-byte entry).
    *
    * The seven patterns ([[graft.engine.mysql.MySqlLogPipeline]]) are
    * literal-anchored with a single capture each, so each is equivalent
    * to a deterministic `indexOf` scan. This expression reproduces
    * `java.util.regex` `find()` semantics EXACTLY (the pinned contract;
    * MySqlFieldsKernelSpec holds it against the live regexes on
    * adversarial entries):
    *  - default-flag `.` excludes the five Java line terminators
    *    (\n \r U+0085 U+2028 U+2029), so a non-DOTALL capture cannot
    *    cross one — a start position whose suffix lies past a terminator
    *    FAILS and find() retries from the next prefix occurrence;
    *  - greedy `(.*)` takes the maximal non-terminator run; non-greedy
    *    `(.*?)` stops at the EARLIEST suffix/lookahead position;
    *  - the DOTALL query pattern's `.*?;\n` is the first ";\n" after
    *    "SET timestamp="; its `(?=\n# Time:|\z)` lookahead is the first
    *    "\n# Time:" after that, else end-of-input.
    *
    * The downstream per-entry regex work is fused in as well (it was 7
    * more regex executions per entry): elements 0/1/3/4/5/6 come back
    * PRE-STRIPPED (≡ `regexp_replace(c, "^PY_WS+|PY_WS+$", "")` over
    * [[graft.engine.expr.Normalizers.PyWhitespaceClass]] — a linear scan,
    * nullness preserved), element 2 is the RAW Query_time capture (the
    * warning message embeds it unstripped), and element 7 is the
    * normalized query (≡ `upper(regexp_replace(stripped_query,
    * "(\b\d+\b)|('[^']*')", "?"))` — the replace as a scan over Java's
    * ASCII \b/\d/\w classes, the upper via the same
    * `UTF8String.toUpperCase` Spark's `upper()` calls).
    *
    * Result: array<string> of 8 nullable elements
    * [time*, user_host*, query_time_raw, lock_time*, rows_sent*,
    * rows_examined*, query*, normalized_query*] (* = stripped) — NULL =
    * pattern did not match (≡ !rlike), never "" for a miss (group 1
    * always participates in these patterns). One toString per entry,
    * zero regex executions.
    */
  case class MySqlEntryFields(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$MySqlFieldsName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(a: Any): Any =
      NativeFunctions.mysqlFieldsRun(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.mysqlFieldsRun($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = MySqlFieldsName
  }

  /** Java-regex default-flag line terminators — the five code points a
    * non-DOTALL `.` refuses to match. */
  @inline private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c.toInt == 0x0085 ||
      c.toInt == 0x2028 || c.toInt == 0x2029

  /** Index of the first line terminator at or after `j` (s.length when
    * the line runs to end-of-input). */
  private def lineEndFrom(s: String, j: Int): Int = {
    var t = j
    val n = s.length
    while (t < n && !isLineTerm(s.charAt(t))) t += 1
    t
  }

  private def utf8(s: String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** ≡ `find()` of `Q(prefix)(.*)`: first prefix occurrence, greedy
    * capture to the end of that line. */
  private def captureRestOfLine(s: String, prefix: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val i = s.indexOf(prefix)
    if (i < 0) null
    else {
      val j = i + prefix.length
      utf8(s.substring(j, lineEndFrom(s, j)))
    }
  }

  /** ≡ `find()` of `Q(prefix)(.*?)Q(suffix)`: the capture cannot cross a
    * line terminator, so a start whose earliest suffix lies past one
    * fails and the scan resumes at the next prefix occurrence. */
  private def captureBetween(s: String, prefix: String, suffix: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    var from = 0
    while (from <= s.length) {
      val i = s.indexOf(prefix, from)
      if (i < 0) return null
      val j = i + prefix.length
      val k = s.indexOf(suffix, j)
      if (k < 0) return null // no suffix after j ⇒ none after any later start
      if (k <= lineEndFrom(s, j)) return utf8(s.substring(j, k))
      from = i + 1 // terminator before the suffix: this start fails
    }
    null
  }

  /** ≡ `find()` of `Q(prefix)(.*?)\n`: the first terminator after the
    * prefix must be a literal \n (a \r or end-of-input fails the start). */
  private def captureUntilLf(s: String, prefix: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    var from = 0
    while (from <= s.length) {
      val i = s.indexOf(prefix, from)
      if (i < 0) return null
      val j = i + prefix.length
      val le = lineEndFrom(s, j)
      if (le < s.length && s.charAt(le) == '\n')
        return utf8(s.substring(j, le))
      from = i + 1
    }
    null
  }

  /** ≡ `find()` of `(?s)SET timestamp=.*?;\n(.*?)(?=\n# Time:|\z)`. */
  private def captureQuery(s: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val i = s.indexOf("SET timestamp=")
    if (i < 0) return null
    val p = s.indexOf(";\n", i + 14) // 14 = "SET timestamp=".length
    if (p < 0) return null // no ";\n" after the first start ⇒ none after any
    val m = p + 2
    val k = s.indexOf("\n# Time:", m)
    utf8(if (k >= 0) s.substring(m, k) else s.substring(m))
  }

  /** One char of [[Normalizers.PyWhitespaceClass]]: Java-regex `\s`
    * (ASCII), \x1C-\x1F, NEL, or Unicode category Z (Zs/Zl/Zp — all
    * BMP, so a char-wise test is exact). */
  @inline private def isPyWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
      c == '\r' || (c >= 0x1C && c <= 0x1F) || c.toInt == 0x85 || {
        val t = Character.getType(c)
        t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
          t == Character.PARAGRAPH_SEPARATOR
      }

  /** ≡ `regexp_replace(s, "^PY_WS+|PY_WS+$", "")` (null-preserving at
    * the call sites — callers pass non-null). */
  private def pyStripStr(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPyWs(s.charAt(a))) a += 1
    while (b > a && isPyWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** The word class Java's `\b` tests against WITHOUT
    * UNICODE_CHARACTER_CLASS: `'_' || Character.isLetterOrDigit(cp)` —
    * Unicode-aware even though `\w`/`\d` stay ASCII in the same mode
    * (openjdk Pattern.Bound; the kernel spec caught exactly this on
    * "é123": é is a word char for `\b`, so the digits keep no boundary
    * and survive the replace).
    */
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_'.toInt || Character.isLetterOrDigit(cp)

  /** Is the code point ENDING at `i` (exclusive) a `\b` word char —
    * surrogate-pair aware, false at the string edge. */
  private def wordBefore(s: String, i: Int): Boolean =
    if (i <= 0) false
    else {
      val c = s.charAt(i - 1)
      if (Character.isLowSurrogate(c) && i >= 2 &&
          Character.isHighSurrogate(s.charAt(i - 2)))
        isWordCp(s.codePointAt(i - 2))
      else isWordCp(c)
    }

  /** Is the code point STARTING at `j` a `\b` word char — surrogate-pair
    * aware, false at the string edge. */
  private def wordAfter(s: String, j: Int): Boolean =
    j < s.length && isWordCp(s.codePointAt(j))

  /** ≡ `upper(regexp_replace(q, "(\b\d+\b)|('[^']*')", "?"))` — the
    * MySQL fingerprint normalizer as one scan. A maximal ASCII digit
    * run (`\d` IS ASCII in default mode) replaces only when BOTH
    * neighbors are non-word per [[isWordCp]] (Java `\b` cannot split a
    * digit run: every interior position has word chars on both sides,
    * so "123abc"/"abc123" stay verbatim); a quote pair replaces
    * leftmost-non-overlapping with `[^']*` free to cross newlines; an
    * unclosed quote matches nothing and scanning continues inside it.
    * Upper parity comes from calling the same `UTF8String.toUpperCase`
    * Spark's `upper()` lowers to.
    */
  private def normalizeSqlStr(q: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = q.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = q.charAt(i)
      if (c >= '0' && c <= '9' && !wordBefore(q, i)) {
        var j = i + 1
        while (j < n && q.charAt(j) >= '0' && q.charAt(j) <= '9') j += 1
        if (!wordAfter(q, j)) { sb.append('?'); i = j }
        else { sb.append(c); i += 1 } // run abuts a word char: no \b match
      } else if (c == '\'') {
        val j = q.indexOf('\'', i + 1)
        if (j >= 0) { sb.append('?'); i = j + 1 }
        else { sb.append(c); i += 1 } // unclosed: no match at this quote
      } else {
        sb.append(c)
        i += 1
      }
    }
    utf8(sb.toString).toUpperCase
  }

  /** Kernel of [[MySqlEntryFields]] — called as a static forwarder from
    * generated code. */
  def mysqlFieldsRun(u: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    val s = u.toString
    def stripped(v: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.unsafe.types.UTF8String =
      if (v == null) null else utf8(pyStripStr(v.toString))
    val q = captureQuery(s)
    val qs = stripped(q)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      stripped(captureRestOfLine(s, "# Time: ")),
      stripped(captureBetween(s, "# User@Host: ", " thread_id:")),
      captureBetween(s, "# Query_time: ", " Lock_time:"),
      stripped(captureBetween(s, "Lock_time: ", " Rows_sent:")),
      stripped(captureBetween(s, "Rows_sent: ", " Rows_examined:")),
      stripped(captureUntilLf(s, "Rows_examined: ")),
      qs,
      if (qs == null) null else normalizeSqlStr(qs.toString)))
  }

  /** Fused language-signal counter: ONE linear scan of the text replaces
    * the four independent `size(regexp_extract_all(...))` passes the
    * language-ID heuristic ran per document (r13 verdict ask #5 —
    * `text_langid` was the suite's biggest absolute row, 25.1 s at sf1 /
    * 57.4 s at sf10, shape-clean but 4× regex + 4 materialized match
    * arrays per row).
    *
    * Result: `array<bigint>` of length `sets.length + 1` — element k =
    * the number of word occurrences from set k, last element = the
    * number of Han-script characters.
    *
    * WORD-BOUNDARY SEMANTICS (r14 ADVICE — stated, not assumed): the
    * scan counts "maximal ASCII-`[A-Za-z0-9_]+` runs whose lowercase
    * form is in the set" — the ASCII `\b` of RE2/DuckDB, which is what
    * the oracle gate replays. This DELIBERATELY diverges from Java's
    * default `\b` (whose boundary test is Unicode-aware via
    * `Character.isLetterOrDigit || '_'`): a set word directly abutting
    * a non-ASCII letter or digit (`"queла"`, `"the中文"`) COUNTS here
    * and under RE2, but did not under the Java-regex battery this scan
    * replaced. The ASCII-boundary reading is the pinned contract
    * (NativeTextScanSpec holds a parity doc for exactly this case);
    * the remaining semantics are shared with the old battery:
    *  - `(?i)` on pure-ASCII patterns is ASCII case folding =
    *    lowercase compare;
    *  - `\p{IsHan}` counts every code point of script Han —
    *    `Character.UnicodeScript.of(cp) == HAN`, surrogate pairs
    *    handled via codePointAt/charCount exactly like the regex engine.
    *
    * One `toString` per document (each regexp call paid its own), zero
    * match-array allocations; tokens longer than the longest set word
    * skip the lookup entirely. The lookup maps word → BITMASK of the
    * sets containing it, so words shared across languages (la/de/que/un
    * appear in both the es and fr inventories) count into every set
    * exactly as the independent regex passes did.
    */
  case class LangSignalCounts(child: Expression, sets: Seq[Seq[String]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    require(sets.nonEmpty && sets.length <= 62,
      s"$LangSignalName supports 1..62 word sets, got ${sets.length}")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$LangSignalName expects a string, got ${other.sql}")
      }

    // word → bitmask of the sets containing it; compiled once per
    // expression instance, shared with codegen via a reference object
    @transient private lazy val wordMask: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      for (k <- sets.indices; w <- sets(k)) {
        val lw = w.toLowerCase(java.util.Locale.ROOT)
        val prev = m.get(lw)
        m.put(lw, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << k)))
      }
      m
    }
    @transient private lazy val maxLen: Int =
      sets.iterator.flatten.map(_.length).max

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.langSignalRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        wordMask, sets.length, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val m = ctx.addReferenceObj("langWordMask", wordMask,
          "java.util.HashMap")
        s"${ev.value} = graft.engine.expr.NativeFunctions.langSignalRun(" +
          s"$c, $m, ${sets.length}, $maxLen);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The per-row kernel of [[LangSignalCounts]] — a plain compiled method
    * so generated code calls ONE static forwarder instead of inlining the
    * scan (constant generated-code size, the SrpSignature lesson).
    */
  def langSignalRun(s: org.apache.spark.unsafe.types.UTF8String,
                    mask: java.util.HashMap[String, java.lang.Long],
                    nSets: Int, maxLen: Int): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](nSets + 1)
    val n = str.length
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val isWord = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (isWord) {
        var j = i + 1
        while (j < n && {
          val d = str.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
            (d >= '0' && d <= '9') || d == '_'
        }) j += 1
        val len = j - i
        if (len <= maxLen) {
          val buf = new Array[Char](len)
          var k = 0
          while (k < len) {
            val ch = str.charAt(i + k)
            buf(k) = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
            k += 1
          }
          val m = mask.get(new String(buf))
          if (m != null) {
            var mm = m.longValue()
            var b = 0
            while (mm != 0L) {
              if ((mm & 1L) != 0L) counts(b) += 1L
              mm >>>= 1
              b += 1
            }
          }
        }
        i = j
      } else {
        val cp = str.codePointAt(i)
        if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN)
          counts(nSets) += 1L
        i += Character.charCount(cp)
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** Fused per-document text statistics: ONE linear scan replaces the
    * FIVE independent regex/split passes of the analyze projection
    * (r14; the same treatment [[LangSignalCounts]] gave the language-ID
    * battery — `text_analyze` was the #2 absolute sf10 row at 101.5 s).
    *
    * Result: `array<bigint>` of
    * `[n_tokens_ws, n_tokens_bpe, n_punct, n_upper, stopword_hits]`.
    *
    * Semantics are BIT-IDENTICAL to the battery it replaces, modeled on
    * Java's regex definitions (the same defaults Spark's regexp
    * functions compile with — `\s`/`\w`/`[A-Z]` are ASCII classes,
    * negated classes consume whole code points):
    *  - `n_tokens_ws` = non-empty segments of `split(text, "\\s+")` =
    *    maximal runs of non-`\s` code points;
    *  - `n_tokens_bpe` = matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`:
    *    maximal ASCII-letter runs + maximal digit runs + one per other
    *    non-`\s` code point (underscore, accents, CJK, NBSP — each a
    *    single third-alternative match);
    *  - `n_punct` = `[^A-Za-z0-9\s]` code points;
    *  - `n_upper` = ASCII `[A-Z]`;
    *  - `stopword_hits` = maximal ASCII-`\w` runs whose lowercase form
    *    is in the set — the ASCII-boundary `\b` of RE2/the oracle,
    *    deliberately NOT Java's Unicode-aware `\b`; see the
    *    [[LangSignalCounts]] word-boundary contract (the one place the
    *    fused scans diverge from the Java-regex battery they replaced).
    */
  case class TextStatCounts(child: Expression, words: Seq[String])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$TextStatName expects a string, got ${other.sql}")
      }

    @transient private lazy val wordSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      words.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
      s
    }
    @transient private lazy val maxLen: Int =
      if (words.isEmpty) 0 else words.iterator.map(_.length).max

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.textStatRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        wordSet, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val m = ctx.addReferenceObj("textStatWords", wordSet,
          "java.util.HashSet")
        s"${ev.value} = graft.engine.expr.NativeFunctions.textStatRun(" +
          s"$c, $m, $maxLen);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The per-row kernel of [[TextStatCounts]] — one compiled code-point
    * scan, called as a static forwarder from generated code.
    */
  def textStatRun(s: org.apache.spark.unsafe.types.UTF8String,
                  words: java.util.HashSet[String],
                  maxLen: Int): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](5)
    val n = str.length
    var i = 0
    var prevLetter = false
    var prevDigit = false
    var prevNonWs = false
    var inWord = false
    var wordStart = 0
    def checkWord(end: Int): Unit = {
      val len = end - wordStart
      if (len <= maxLen) {
        val buf = new Array[Char](len)
        var k = 0
        while (k < len) {
          val ch = str.charAt(wordStart + k)
          buf(k) = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
          k += 1
        }
        if (words.contains(new String(buf))) counts(4) += 1L
      }
    }
    while (i < n) {
      val cp = str.codePointAt(i)
      val isLetter = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
      val isDigit = cp >= '0' && cp <= '9'
      // Java regex \s — the ASCII class [ \t\n\x0B\f\r], NOT Unicode
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!isWs && !prevNonWs) counts(0) += 1L
      if (isLetter && !prevLetter) counts(1) += 1L
      if (isDigit && !prevDigit) counts(1) += 1L
      if (!isLetter && !isDigit && !isWs) { counts(1) += 1L; counts(2) += 1L }
      if (cp >= 'A' && cp <= 'Z') counts(3) += 1L
      val isWord = isLetter || isDigit || cp == '_'
      if (isWord && !inWord) { wordStart = i; inWord = true }
      else if (!isWord && inWord) { checkWord(i); inWord = false }
      prevLetter = isLetter
      prevDigit = isDigit
      prevNonWs = !isWs
      i += Character.charCount(cp)
    }
    if (inWord) checkWord(n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** Karp-Rabin winnowing fingerprint: the min and distinct count of the
    * polynomial rolling hash of every `w`-code-point window of the text,
    * in ONE scan — `struct<fingerprint_h: bigint, n_distinct_windows:
    * int>`.
    *
    * Replaces the md5-per-window form (r14 verdict ask #3: one md5 per
    * CHARACTER made `text_winnow` the worst decade ratio in the suite,
    * 9.9×/39.4 s at sf10 — ~100× the per-byte cost of any other scan).
    * The hash is the textbook Karp-Rabin polynomial over Unicode CODE
    * POINTS,
    *
    *   H(c₀…c_{w−1}) = Σ cᵢ · B^{w−1−i}  mod  M,
    *   B = 257, M = 2⁶¹ − 1 (Mersenne),
    *
    * advanced in O(1) per window by the classic subtract-leading /
    * multiply / add-trailing update — exact modular arithmetic, so the
    * rolling form is VALUE-IDENTICAL to hashing each window
    * independently (WinnowSpec asserts it against a naive fold). M fits
    * HUGEINT arithmetic, so DuckDB replays the identical values with
    * `(h::HUGEINT * 257 + c) % M` folds — the fingerprint stays
    * oracle-exact, like the md5 form was. 61-bit hashes keep cross-doc
    * min-fingerprint collisions (the clustering key of
    * `dedup_winnow_clusters`) as improbable as the 60-bit md5 prefixes
    * they replace; a narrower word (e.g. 31-bit) would manufacture
    * ~n²·nWin/2³¹ false clusters at crawl scale because MIN-selection
    * concentrates the fingerprint distribution near 0.
    *
    * Window rule (replicated from the md5 form): texts of at least `w`
    * code points hash every full window (n − w + 1 of them); shorter
    * texts — including empty — hash ONCE over all their code points
    * (the old `substr(i, w)` truncation), with H(empty) = 0.
    *
    * SWITCHING COST: fingerprint VALUES are incomparable with the md5
    * build — recluster, don't mix (an index REBUILD, exactly like a
    * SimHash width change).
    */
  /** Single-pass Gopher-repetition counters over a token array (r16 —
    * the [[TextStatCounts]] treatment applied to `text_repetition`):
    * [n_words, n_distinct_words, top_word_cnt, n2, d2, n3, d3] in ONE
    * compiled scan of the tokens. The previous shape paid TWO shuffles
    * (explode → (doc, word) agg → doc agg) for the word stats and two
    * interpreted higher-order transforms building 2/3-gram STRINGS plus
    * array_distinct over them for the gram stats — all of it per-doc
    * local work that never needed an exchange.
    *
    * Exactness contract (the oracle counts distinct gram STRINGS
    * `t[i] || ' ' || t[i+1]`): tokens are whitespace-split, so the
    * joined gram string is injective in the token tuple, and the kernel
    * counts distinct tuples via DENSE WORD IDS — a 2-gram is the long
    * (idA << 32 | idB), a 3-gram is (dense 2-gram id << 32 | idC) —
    * never a lossy hash, so the counts are bit-identical to the string
    * form at any input. Empty/null tokens are skipped, which makes
    * `word_rep_counts(split(lower(text), '\\s+'))` equal to the
    * filtered wsTokens form without the interpreted filter() HOF.
    */
  case class WordRepCounts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) | StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$WordRepName expects array<string> or string, got ${other.sql}")
      }
    private def fromText: Boolean = child.dataType == StringType

    override def nullSafeEval(a: Any): Any =
      if (fromText)
        NativeFunctions.wordRepRunText(
          a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      else NativeFunctions.wordRepRun(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        if (fromText)
          s"${ev.value} = graft.engine.expr.NativeFunctions.wordRepRunText($c);"
        else s"${ev.value} = graft.engine.expr.NativeFunctions.wordRepRun($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = WordRepName
  }

  /** Shared counting core of [[WordRepCounts]]: tokens stream in as
    * dense ids, grams are dense-id composites — every distinct count is
    * exact (no hashing of content into a fixed width anywhere).
    */
  private final class WordRepAcc(sizeHint: Int) {
    private val ids =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    private var counts = new Array[Long](16)
    private var pos = new Array[Int](math.max(sizeHint, 16))
    private var n = 0

    def add(s: org.apache.spark.unsafe.types.UTF8String): Unit = {
      var id = ids.get(s)
      if (id == null) {
        id = Integer.valueOf(ids.size())
        ids.put(s, id)
        if (id.intValue() >= counts.length)
          counts = java.util.Arrays.copyOf(counts, counts.length * 2)
      }
      counts(id.intValue()) += 1L
      if (n >= pos.length) pos = java.util.Arrays.copyOf(pos, pos.length * 2)
      pos(n) = id.intValue()
      n += 1
    }

    def result(): ArrayData = {
      val distinct = ids.size()
      var top = 0L
      var k = 0
      while (k < distinct) { if (counts(k) > top) top = counts(k); k += 1 }
      // 2-grams: dense gram ids (map value) double as the 3-gram prefix
      val gram2 = new java.util.HashMap[java.lang.Long, Integer]()
      val g2pos = if (n >= 2) new Array[Int](n - 1) else null
      var j = 0
      while (j + 1 < n) {
        val key = (pos(j).toLong << 32) | (pos(j + 1).toLong & 0xffffffffL)
        var g = gram2.get(key)
        if (g == null) { g = Integer.valueOf(gram2.size()); gram2.put(key, g) }
        g2pos(j) = g.intValue()
        j += 1
      }
      val set3 = new java.util.HashSet[java.lang.Long]()
      j = 0
      while (j + 2 < n) {
        set3.add((g2pos(j).toLong << 32) | (pos(j + 2).toLong & 0xffffffffL))
        j += 1
      }
      val n2 = if (n >= 2) (n - 1).toLong else 0L
      val n3 = if (n >= 3) (n - 2).toLong else 0L
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Long](n.toLong, distinct.toLong, top,
          n2, gram2.size().toLong, n3, set3.size().toLong))
    }
  }

  /** Array-input kernel of [[WordRepCounts]] — called as a static
    * forwarder from generated code. Empty/null elements are skipped
    * (the wsTokens filter contract).
    */
  def wordRepRun(arr: ArrayData): ArrayData = {
    val total = arr.numElements()
    val acc = new WordRepAcc(total)
    var i = 0
    while (i < total) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (s != null && s.numBytes() > 0) acc.add(s)
      i += 1
    }
    acc.result()
  }

  /** Text-input kernel of [[WordRepCounts]]: lowercases via the SAME
    * UTF8String.toLowerCase Spark's `lower()` calls, then splits on runs
    * of Java-regex `\s` (space, tab, LF, VT, FF, CR — ASCII bytes, which in
    * UTF-8 never occur inside a multi-byte character, so byte-position
    * splitting is exact) — value-identical to
    * `word_rep_counts(split(lower(text), '\s+'))` without the regex
    * engine or the per-document token-array materialization.
    */
  def wordRepRunText(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val len = b.length
    val acc = new WordRepAcc(16)
    var i = 0
    var start = -1
    while (i < len) {
      val c = b(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
        c == '\f' || c == '\r'
      if (ws) {
        if (start >= 0) {
          acc.add(org.apache.spark.unsafe.types.UTF8String
            .fromBytes(b, start, i - start))
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0)
      acc.add(org.apache.spark.unsafe.types.UTF8String
        .fromBytes(b, start, len - start))
    acc.result()
  }

  case class WinnowKarpRabin(child: Expression, w: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

    require(w >= 1 && w <= 4096, s"$WinnowName: window must be 1..4096, got $w")

    override def dataType: DataType = StructType(Seq(
      StructField("fingerprint_h", LongType, nullable = false),
      StructField("n_distinct_windows", IntegerType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$WinnowName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.winnowRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.winnowRun($c, $w);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** First `hexChars` hex digits of md5 as a BIGINT — VALUE-IDENTICAL to
    * `conv(substring(md5(c), 1, hexChars), 16, 10)` (Md5PrefixSpec pins
    * the equality), without that chain's allocations: the built-in form
    * materializes a 32-char hex string, a substring copy and a conv
    * parse PER ROW, and the resulting allocation churn — not the md5
    * arithmetic — dominated the shingle pipelines at decade scale
    * (r15 measured the cold sf10 candidate build at 74.5 s through the
    * hex chain vs 31.6 s through an allocation-free hash; md5 itself
    * prices at ~5 CPU-seconds for the whole corpus). One thread-local
    * MessageDigest, one 16-byte digest array per row, top bits taken
    * big-endian — the md5 VALUE is unchanged, so every DuckDB oracle
    * replays `('0x' || substring(md5(s), 1, N))::BIGINT` exactly as
    * before.
    */
  case class Md5PrefixLong(child: Expression, hexChars: Int,
                           startHex: Int = 1)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    require(hexChars >= 1 && hexChars <= 15,
      s"$Md5PrefixName: hexChars must be 1..15 (a BIGINT holds < 16), got $hexChars")
    require(startHex >= 1 && startHex - 1 + hexChars <= 32,
      s"$Md5PrefixName: slice [$startHex, +$hexChars) exceeds the 32 md5 hex digits")

    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$Md5PrefixName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.md5PrefixRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        hexChars, startHex)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.md5PrefixRun(" +
          s"$c, $hexChars, $startHex);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel of [[Md5PrefixLong]]: digest the UTF-8 bytes,
    * read the 128-bit digest as two big-endian longs, and take the
    * 4·hexChars bits starting at hex digit `startHex` (1-based) — the
    * value of `substring(md5hex, startHex, hexChars)` parsed base-16,
    * bit-for-bit (the simhash halves read slices at 1 and 16).
    */
  def md5PrefixRun(s: org.apache.spark.unsafe.types.UTF8String,
                   hexChars: Int, startHex: Int): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    def be(o: Int): Long =
      ((d(o) & 0xffL) << 56) | ((d(o + 1) & 0xffL) << 48) |
      ((d(o + 2) & 0xffL) << 40) | ((d(o + 3) & 0xffL) << 32) |
      ((d(o + 4) & 0xffL) << 24) | ((d(o + 5) & 0xffL) << 16) |
      ((d(o + 6) & 0xffL) << 8) | (d(o + 7) & 0xffL)
    val off = 4 * (startHex - 1) // bit offset from the digest MSB
    val hi = be(0)
    // 128-bit left shift by `off`, keep the top 64: Java shifts are mod
    // 64, so the off == 0 and off == 64 boundaries branch explicitly
    val shifted =
      if (off == 0) hi
      else if (off < 64) (hi << off) | (be(8) >>> (64 - off))
      else be(8) << (off - 64)
    shifted >>> (64 - 4 * hexChars)
  }

  /** Reusable 16-byte digest output for the tokenizing kernels below
    * (md5 per token/window, thousands per row — `md.digest()`'s fresh
    * array each call is measurable garbage at that rate).
    */
  private val md5Out = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Byte-scan tokenizer shared by [[ShingleHashes]] and [[SimhashSig]]:
    * lowercase via `UTF8String.toLowerCase` (exactly Spark's `lower()`
    * under the default UTF8_BINARY collation), then token = maximal run
    * of non-`\s` BYTES, where `\s` is Java regex's ASCII class
    * `[ \t\n\x0B\f\r]` — the byte ranges are bit-identical to the
    * elements of `filter(split(lower(text), "\\s+"), _ != "")`
    * re-encoded as UTF-8, because all six `\s` bytes are ASCII and can
    * never occur inside a multi-byte UTF-8 sequence. Fills `starts`/
    * `ends` (token i = bytes [starts(i), ends(i))) and returns the
    * token count; arrays grow geometrically and are reused per thread.
    */
  private final class TokenRanges {
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    def tokenize(bytes: Array[Byte]): Int = {
      var n = 0
      var i = 0
      val len = bytes.length
      while (i < len) {
        val b = bytes(i)
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        if (!ws) {
          val s = i
          var j = i
          while (j < len && {
            val c = bytes(j)
            !(c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
              c == '\f' || c == '\r')
          }) j += 1
          if (n >= starts.length) {
            starts = java.util.Arrays.copyOf(starts, starts.length * 2)
            ends = java.util.Arrays.copyOf(ends, ends.length * 2)
          }
          starts(n) = s; ends(n) = j; n += 1
          i = j
        } else i += 1
      }
      n
    }
  }
  private val tokenRanges = new ThreadLocal[TokenRanges] {
    override def initialValue(): TokenRanges = new TokenRanges
  }

  /** Kernel of [[ShingleHashes]]: every positional n-token shingle's
    * md5 prefix (`hexChars` hex digits as BIGINT) in ONE scan —
    * element i = `md5_prefix_long(concat_ws(' ', tok_i..tok_{i+n-1}),
    * hexChars)` over the [[TokenRanges]] tokens of `lower(text)`. The
    * digest streams the token byte ranges plus single 0x20 separators,
    * so the shingle STRING is never materialized (the legacy form
    * allocated a token array, n `element_at` calls and a concat per
    * position). Docs with < n tokens return an EMPTY array: the
    * consumers explode, so they produce no rows — exactly the
    * `filter(size(toks) >= n)` the legacy form applied.
    */
  def shingleHashRun(s: org.apache.spark.unsafe.types.UTF8String,
                     n: Int, hexChars: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleHashArray(s, n, hexChars))

  private def shingleHashArray(s: org.apache.spark.unsafe.types.UTF8String,
                               n: Int, hexChars: Int): Array[Long] = {
    val bytes = s.toLowerCase.getBytes
    val tr = tokenRanges.get()
    val t = tr.tokenize(bytes)
    if (t < n) return Array.emptyLongArray
    val md = md5Digest.get()
    val d = md5Out.get()
    val out = new Array[Long](t - n + 1)
    val shift = 64 - 4 * hexChars
    var w = 0
    while (w + n <= t) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(0x20.toByte)
        md.update(bytes, tr.starts(w + j), tr.ends(w + j) - tr.starts(w + j))
        j += 1
      }
      md.digest(d, 0, 16)
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(w) = hi >>> shift
      w += 1
    }
    out
  }

  /** Kernel of [[ShingleHashSet]]: the DISTINCT shingle hashes of one
    * document, ascending. Computes the same positional values as
    * [[shingleHashRun]], then sorts and compacts in place — a per-doc
    * dedup at the scan. Exactness: a downstream global
    * `distinct (doc_id, sh_h)` partitions by doc_id anyway, so per-doc
    * dedup produces the IDENTICAL row set with zero exchanges (the
    * consumers that used to pay a distinct shuffle read these arrays
    * directly). Output order is ascending hash — consumers explode into
    * aggregations, so order never reaches a result.
    */
  def shingleHashSetRun(s: org.apache.spark.unsafe.types.UTF8String,
                        n: Int, hexChars: Int): ArrayData = {
    val a = shingleHashArray(s, n, hexChars)
    if (a.length > 1) {
      java.util.Arrays.sort(a)
      var w = 1
      var i = 1
      while (i < a.length) {
        if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
        i += 1
      }
      if (w < a.length)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOf(a, w))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
  }

  /** Kernel of [[SimhashSig]]: the whole per-document SimHash signature
    * in ONE scan — one md5 digest per token (BOTH 60-bit halves read
    * from the same digest; the legacy column form ran the digest twice
    * per token), ±1 votes accumulated locally, band-packed exactly as
    * `Dedup.simhashSigAt` packs them (bit j of band b set when
    * 2·ones[b·bpb+j] > n). Returns null for a document with ZERO
    * tokens — the legacy explode+groupBy emitted no row for those, so
    * callers filter nulls to keep row sets identical.
    */
  def simhashSigRun(s: org.apache.spark.unsafe.types.UTF8String,
                    bands: Int, bitsPerBand: Int): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val tr = tokenRanges.get()
    val t = tr.tokenize(bytes)
    if (t == 0) return null
    val total = bands * bitsPerBand
    val ones = new Array[Int](total)
    val md = md5Digest.get()
    val d = md5Out.get()
    var i = 0
    while (i < t) {
      md.reset()
      md.update(bytes, tr.starts(i), tr.ends(i) - tr.starts(i))
      md.digest(d, 0, 16)
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val lo =
        ((d(8) & 0xffL) << 56) | ((d(9) & 0xffL) << 48) |
        ((d(10) & 0xffL) << 40) | ((d(11) & 0xffL) << 32) |
        ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
        ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
      // the two 60-bit md5 halves, exactly md5_prefix_long(tok, 15, 1)
      // and md5_prefix_long(tok, 15, 16)
      val h0 = hi >>> 4
      val h1 = ((hi << 60) | (lo >>> 4)) >>> 4
      var p = 0
      while (p < total) {
        val h = if (p < 60) h0 else h1
        ones(p) += ((h >>> (p % 60)) & 1L).toInt
        p += 1
      }
      i += 1
    }
    val sig = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var j = 0
      while (j < bitsPerBand) {
        if (2L * ones(b * bitsPerBand + j) > t) acc += (1L << j)
        j += 1
      }
      sig(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** All positional n-token shingle md5-prefix hashes of `lower(text)`
    * as `array<bigint>` — see [[shingleHashRun]] for the value contract
    * (bit-identical to the legacy tokens/element_at/concat_ws/
    * md5_prefix_long column chain, shingle string never materialized).
    */
  case class ShingleHashes(child: Expression, n: Int, hexChars: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    require(n >= 1, s"$ShingleHashName: n must be >= 1, got $n")
    require(hexChars >= 1 && hexChars <= 15,
      s"$ShingleHashName: hexChars must be 1..15, got $hexChars")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$ShingleHashName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.shingleHashRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, hexChars)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.shingleHashRun(" +
          s"$c, $n, $hexChars);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = ShingleHashName
  }

  /** DISTINCT n-token shingle md5-prefix hashes of `lower(text)` as a
    * sorted `array<bigint>` — the per-document dedup of
    * [[ShingleHashes]]' positional output (see [[shingleHashSetRun]]).
    */
  case class ShingleHashSet(child: Expression, n: Int, hexChars: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    require(n >= 1, s"$ShingleHashSetName: n must be >= 1, got $n")
    require(hexChars >= 1 && hexChars <= 15,
      s"$ShingleHashSetName: hexChars must be 1..15, got $hexChars")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$ShingleHashSetName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.shingleHashSetRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, hexChars)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.shingleHashSetRun(" +
          s"$c, $n, $hexChars);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = ShingleHashSetName
  }

  /** Per-document SimHash signature as `array<bigint>` of `bands`
    * band-packed vote words — see [[simhashSigRun]] for the value
    * contract (null for zero-token docs; callers filter).
    */
  case class SimhashSig(child: Expression, bands: Int, bitsPerBand: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType

    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 60 &&
      bands * bitsPerBand <= 120,
      s"$SimhashSigName: need 1 <= bitsPerBand <= 60 and bands * " +
        s"bitsPerBand <= 120 (two md5 halves); got $bands x $bitsPerBand")

    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$SimhashSigName expects a string, got ${other.sql}")
      }

    override def nullSafeEval(s: Any): Any =
      NativeFunctions.simhashSigRun(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        bands, bitsPerBand)

    // the kernel returns null for zero-token docs, so the generated code
    // must re-derive isNull from the call result (plain nullSafeCodeGen
    // would leave isNull=false around a null value)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.engine.expr.NativeFunctions.simhashSigRun(" +
          s"$c, $bands, $bitsPerBand);\n" +
          s"${ev.isNull} = ${ev.value} == null;")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = SimhashSigName
  }

  /** 2⁶¹ − 1, the Karp-Rabin modulus (Mersenne: `x mod M` reduces by
    * shift-and-add, and `a · b mod M` needs only a 64×64→128 multiply —
    * `Math.multiplyHigh` here, HUGEINT in the oracle's replay).
    */
  val KrMod: Long = 2305843009213693951L
  /** Karp-Rabin radix: any value > max code point's contribution works;
    * 257 is the classic byte-alphabet prime. */
  val KrBase: Long = 257L

  /** a · b mod (2⁶¹ − 1) for a, b ∈ [0, M): split the 128-bit product at
    * bit 61 (2⁶¹ ≡ 1 mod M, so the high part folds in by addition). */
  private def krMulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // product = hi·2⁶⁴ + lo; (product >> 61) = (hi << 3) | (lo >>> 61)
    var r = (lo & KrMod) + ((hi << 3) | (lo >>> 61))
    if (r >= KrMod) r -= KrMod
    if (r >= KrMod) r -= KrMod
    r
  }

  /** The per-row kernel of [[WinnowKarpRabin]] — compiled once, called as
    * a static forwarder from generated code (the langSignalRun pattern).
    * Min and distinct count come from one in-place sort of the window
    * hashes: primitive longs, no boxing, no per-window string or hash-set
    * allocation.
    */
  def winnowRun(s: org.apache.spark.unsafe.types.UTF8String,
                w: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val cps = new Array[Int](str.length)
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    val nWin = if (n <= w) 1 else n - w + 1
    val hashes = new Array[Long](nWin)
    var h = 0L
    val w0 = math.min(n, w)
    i = 0
    while (i < w0) {
      h = krMulMod(h, KrBase) + cps(i)
      if (h >= KrMod) h -= KrMod
      i += 1
    }
    hashes(0) = h
    if (nWin > 1) {
      var bw = 1L // B^(w-1) mod M
      var e = 0
      while (e < w - 1) { bw = krMulMod(bw, KrBase); e += 1 }
      var k = 1
      while (k < nWin) {
        h -= krMulMod(cps(k - 1).toLong, bw)
        if (h < 0L) h += KrMod
        h = krMulMod(h, KrBase) + cps(k + w - 1)
        if (h >= KrMod) h -= KrMod
        hashes(k) = h
        k += 1
      }
    }
    java.util.Arrays.sort(hashes)
    var distinct = 1
    var j = 1
    while (j < nWin) {
      if (hashes(j) != hashes(j - 1)) distinct += 1
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hashes(0), distinct))
  }

  val QdotName = "qdot_native"
  val SrpSignatureName = "srp_signature"
  val PyCheckName = "py_parity_check"
  val PyErrorBranchName = "py_error_branch"
  val OpaqueName = "graft_opaque"
  val RegexFindName = "regex_find_group"
  val LangSignalName = "lang_signal_counts"
  val TextStatName = "text_stat_counts"
  val WinnowName = "winnow_karp_rabin"
  val Md5PrefixName = "md5_prefix_long"
  val WordRepName = "word_rep_counts"
  val MySqlFieldsName = "mysql_entry_fields"
  val ShingleHashName = "shingle_hashes"
  val ShingleHashSetName = "shingle_hash_set"
  val SimhashSigName = "simhash_sig"

  /** `shingle_hashes(text, n, hexChars)` builder: both knobs must be
    * foldable integer literals. */
  def buildShingleHashes(exprs: Seq[Expression]): Expression = {
    checkArity(ShingleHashName, 3, exprs)
    ShingleHashes(exprs(0),
      foldableInt(ShingleHashName, "n", exprs(1)),
      foldableInt(ShingleHashName, "hexChars", exprs(2)))
  }

  /** `shingle_hash_set(text, n, hexChars)` builder: both knobs must be
    * foldable integer literals. */
  def buildShingleHashSet(exprs: Seq[Expression]): Expression = {
    checkArity(ShingleHashSetName, 3, exprs)
    ShingleHashSet(exprs(0),
      foldableInt(ShingleHashSetName, "n", exprs(1)),
      foldableInt(ShingleHashSetName, "hexChars", exprs(2)))
  }

  /** `simhash_sig(text, bands, bitsPerBand)` builder: both knobs must
    * be foldable integer literals. */
  def buildSimhashSig(exprs: Seq[Expression]): Expression = {
    checkArity(SimhashSigName, 3, exprs)
    SimhashSig(exprs(0),
      foldableInt(SimhashSigName, "bands", exprs(1)),
      foldableInt(SimhashSigName, "bitsPerBand", exprs(2)))
  }

  private def foldableInt(fn: String, what: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $what must be foldable")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: integral $what expected, got $other")
    }
  }

  /** `md5_prefix_long(text, hexChars[, startHex])` builder: width and
    * optional 1-based start must be foldable integer literals. */
  def buildMd5Prefix(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2 && exprs.length != 3)
      // not checkArity: that helper states ONE expected count, and this
      // function legitimately takes 2 or 3 arguments (r15 ADVICE — a
      // 4-arg caller was told "takes exactly 2" when 3 is also valid)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$Md5PrefixName`",
          "expectedNum" -> "[2, 3]",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    def intOf(e: Expression, what: String): Int = {
      require(e.foldable, s"$Md5PrefixName: $what must be foldable")
      e.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case other => throw new IllegalArgumentException(
          s"$Md5PrefixName: integral $what expected, got $other")
      }
    }
    val h = intOf(exprs(1), "width")
    val s = if (exprs.length == 3) intOf(exprs(2), "start") else 1
    Md5PrefixLong(exprs(0), h, s)
  }

  /** `winnow_karp_rabin(text, w)` builder: the window width must be a
    * foldable integer literal (it sizes the rolling update).
    */
  def buildWinnow(exprs: Seq[Expression]): Expression = {
    checkArity(WinnowName, 2, exprs)
    require(exprs(1).foldable, s"$WinnowName: the window width must be foldable")
    val w = exprs(1).eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case s: java.lang.Short => s.intValue()
      case other => throw new IllegalArgumentException(
        s"$WinnowName: integral window width expected, got $other")
    }
    WinnowKarpRabin(exprs(0), w)
  }

  /** `text_stat_counts(text, words)` builder: the stopword set must be a
    * foldable array<string> literal.
    */
  def buildTextStat(exprs: Seq[Expression]): Expression = {
    checkArity(TextStatName, 2, exprs)
    require(exprs(1).foldable,
      s"$TextStatName: the word set must be foldable")
    val ad = exprs(1).eval().asInstanceOf[ArrayData]
    // IndexedSeq, not Array: case-class equality on the word set must be
    // by CONTENT so identical calls canonicalize equal and Catalyst can
    // reuse subexpressions (r14 ADVICE — Array fields compare by
    // reference and defeat CSE).
    val words = IndexedSeq.tabulate(ad.numElements())(w =>
      ad.getUTF8String(w).toString)
    TextStatCounts(exprs(0), words)
  }

  /** `lang_signal_counts(text, sets)` builder: the word-set matrix must
    * be a foldable array<array<string>> literal (folded once at
    * resolution, like SrpSignature's coefficients).
    */
  def buildLangSignal(exprs: Seq[Expression]): Expression = {
    checkArity(LangSignalName, 2, exprs)
    require(exprs(1).foldable,
      s"$LangSignalName: the word-set matrix must be foldable")
    val ad = exprs(1).eval().asInstanceOf[ArrayData]
    // content-equal IndexedSeqs for canonicalization — see buildTextStat
    val sets = IndexedSeq.tabulate(ad.numElements()) { k =>
      val row = ad.getArray(k)
      IndexedSeq.tabulate(row.numElements())(w =>
        row.getUTF8String(w).toString)
    }
    LangSignalCounts(exprs(0), sets)
  }

  /** A wrong argument count must fail analysis with the standard
    * WRONG_NUM_ARGS AnalysisException, not an IndexOutOfBoundsException
    * from the builder indexing exprs(0)/exprs(1) blind.
    */
  def checkArity(name: String, expected: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** `qdot_native(a, b)` builder: overflow semantics follow the session's
    * ANSI setting at analysis time, exactly like a built-in `*`/`+` would.
    */
  def buildQdot(exprs: Seq[Expression]): Expression = {
    checkArity(QdotName, 2, exprs)
    LongArrayDot(exprs(0), exprs(1),
      failOnError = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  }

  /** Idempotently register the expressions in the session's function
    * registry (the public route to a Column over a custom Expression).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.catalog.functionExists(QdotName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        QdotName, buildQdot, "built-in")
    if (!spark.catalog.functionExists(PyCheckName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        PyCheckName, exprs => {
          checkArity(PyCheckName, 1, exprs)
          PyParity.PyParityCheck(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(PyErrorBranchName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        PyErrorBranchName, exprs => {
          checkArity(PyErrorBranchName, 1, exprs)
          PyParity.PyErrorBranchCheck(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(OpaqueName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        OpaqueName, exprs => {
          checkArity(OpaqueName, 1, exprs)
          OpaqueBarrier(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(RegexFindName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        RegexFindName, exprs => {
          checkArity(RegexFindName, 2, exprs)
          RegexFindGroup(exprs(0), exprs(1))
        }, "built-in")
    if (!spark.catalog.functionExists(LangSignalName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        LangSignalName, buildLangSignal, "built-in")
    if (!spark.catalog.functionExists(TextStatName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        TextStatName, buildTextStat, "built-in")
    if (!spark.catalog.functionExists(WinnowName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        WinnowName, buildWinnow, "built-in")
    if (!spark.catalog.functionExists(Md5PrefixName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        Md5PrefixName, buildMd5Prefix, "built-in")
    if (!spark.catalog.functionExists(MongoJson.MongoLineParseName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        MongoJson.MongoLineParseName, exprs => {
          checkArity(MongoJson.MongoLineParseName, 1, exprs)
          MongoJson.MongoLineParse(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(MySqlFieldsName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        MySqlFieldsName, exprs => {
          checkArity(MySqlFieldsName, 1, exprs)
          MySqlEntryFields(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(WordRepName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        WordRepName, exprs => {
          checkArity(WordRepName, 1, exprs)
          WordRepCounts(exprs(0))
        }, "built-in")
    if (!spark.catalog.functionExists(ShingleHashName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ShingleHashName, buildShingleHashes, "built-in")
    if (!spark.catalog.functionExists(ShingleHashSetName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ShingleHashSetName, buildShingleHashSet, "built-in")
    if (!spark.catalog.functionExists(SimhashSigName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        SimhashSigName, buildSimhashSig, "built-in")
    if (!spark.catalog.functionExists(SrpSignatureName))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        SrpSignatureName, exprs => {
          checkArity(SrpSignatureName, 2, exprs)
          require(exprs(1).foldable,
            s"$SrpSignatureName: the coefficient matrix must be foldable")
          val ad = exprs(1).eval().asInstanceOf[ArrayData]
          val coefs = Array.tabulate(ad.numElements())(p =>
            ad.getArray(p).toLongArray())
          SrpSignature(exprs(0), coefs)
        }, "built-in")
  }

  /** Codegen'd exact dot product; caller must have ensureRegistered. */
  def qdotNative(a: Column, b: Column): Column = call_function(QdotName, a, b)

  /** Codegen'd full SRP signature (see [[SrpSignature]]); `coefs` becomes
    * a foldable nested-array literal folded at resolution. Caller must
    * have ensureRegistered.
    */
  def srpSignature(q: Column, coefs: Seq[Seq[Long]]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    call_function(SrpSignatureName, q,
      array(coefs.map(row => array(row.map(lit): _*)): _*))
  }

  /** Fused word-set + Han-char counter (see [[LangSignalCounts]]); the
    * set matrix becomes a foldable nested-array literal. Caller must
    * have ensureRegistered.
    */
  def langSignalCounts(text: Column, sets: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    call_function(LangSignalName, text,
      array(sets.map(row => array(row.map(lit): _*)): _*))
  }

  /** Fused text-statistics counter (see [[TextStatCounts]]); the word
    * set becomes a foldable array literal. Caller must have
    * ensureRegistered.
    */
  def textStatCounts(text: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    call_function(TextStatName, text, array(words.map(lit): _*))
  }

  /** Single-pass repetition counters over a token array (see
    * [[WordRepCounts]]); caller must have ensureRegistered.
    */
  def wordRepCounts(tokens: Column): Column =
    call_function(WordRepName, tokens)

  /** Positional n-token shingle md5-prefix hashes (see [[ShingleHashes]]);
    * caller must have ensureRegistered. */
  def shingleHashes(text: Column, n: Int, hexChars: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(ShingleHashName, text, lit(n), lit(hexChars))
  }

  /** Distinct sorted shingle hashes per document (see [[ShingleHashSet]]);
    * caller must have ensureRegistered. */
  def shingleHashSet(text: Column, n: Int, hexChars: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(ShingleHashSetName, text, lit(n), lit(hexChars))
  }

  /** Per-document SimHash signature (see [[SimhashSig]]); caller must
    * have ensureRegistered. */
  def simhashSig(text: Column, bands: Int, bitsPerBand: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(SimhashSigName, text, lit(bands), lit(bitsPerBand))
  }

  /** Karp-Rabin winnowing fingerprint (see [[WinnowKarpRabin]]); caller
    * must have ensureRegistered.
    */
  def winnowKarpRabin(text: Column, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(WinnowName, text, lit(w))
  }

  /** Allocation-free md5 hex-prefix long (see [[Md5PrefixLong]]); caller
    * must have ensureRegistered (every engine session does — the
    * extension installs it, ensureRegistered is the embedded fallback).
    */
  def md5PrefixLong(text: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(Md5PrefixName, text, lit(hexChars))
  }

  /** Hex-slice variant: `substring(md5(s), startHex, hexChars)` base-16
    * — the simhash second half reads digits 16..30. */
  def md5SliceLong(text: Column, startHex: Int, hexChars: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(Md5PrefixName, text, lit(hexChars), lit(startHex))
  }

  /** Optimizer-opaque identity (see [[OpaqueBarrier]]); caller must have
    * ensureRegistered.
    */
  def opaque(c: Column): Column = call_function(OpaqueName, c)

  /** Python-parity exception text for a mongod log line (see [[PyParity]]);
    * caller must have ensureRegistered.
    */
  def pyParityCheck(line: Column): Column = call_function(PyCheckName, line)

  /** Reference error-branch membership; caller must have ensureRegistered. */
  def pyErrorBranch(line: Column): Column = call_function(PyErrorBranchName, line)

  /** One-execution regex find+extract (see [[RegexFindGroup]]); caller
    * must have ensureRegistered.
    */
  def regexFindGroup(subject: Column, pattern: Column): Column =
    call_function(RegexFindName, subject, pattern)

  /** All seven MySQL slow-log captures in one compiled pass (see
    * [[MySqlEntryFields]]); caller must have ensureRegistered.
    */
  def mysqlEntryFields(entry: Column): Column =
    call_function(MySqlFieldsName, entry)
}
