package graft.api

/** Request-parameter validation — the API layer's P5/P6 guards
  * (services/api/app/routers/ticks.py:10-19,33,65; bars.py:10-19,26,61,
  * 116-117) as total functions returning Either instead of HTTP 422.
  * These run driver-side before a plan is built; they are deliberately not
  * plan operators (SURVEY.md §2.2).
  */
object QueryParams {

  private val SymbolPattern = "^[A-Za-z]{1,10}$".r

  /** P5: symbol must be 1-10 ASCII letters; normalized to upper case
    * (reference F10).
    */
  def validateSymbol(raw: String): Either[String, String] =
    raw match {
      case SymbolPattern() => Right(raw.toUpperCase)
      case _ => Left(s"invalid symbol: '$raw' (expected 1-10 letters)")
    }

  /** P6 range guards, one per endpoint bound. */
  def validateLimit(limit: Int, max: Int): Either[String, Int] =
    if (limit >= 1 && limit <= max) Right(limit)
    else Left(s"limit must be in [1, $max], got $limit")

  def validateMinutes(minutes: Int): Either[String, Int] =
    validateLimit(minutes, 1440).left.map(_.replace("limit", "minutes"))

  /** Endpoint caps from the reference (ticks ≤ 100, bars ≤ 1440,
    * movers ≤ 20).
    */
  val TicksLimitMax  = 100
  val BarsLimitMax   = 1440
  val MoversLimitMax = 20

  /** The reference's 404-on-empty rule (ticks.py:86-90, bars.py:83-88): a
    * summary window that matched no rows is a named absence, not a
    * zero-row success. The API layer inspects the aggregate's count and
    * converts zero into Left before serializing.
    */
  def requireData(count: Long, what: String): Either[String, Long] =
    if (count > 0) Right(count)
    else Left(s"not found: no data for $what")
}
