package graft

import graft.api.QueryParams
import org.scalatest.funsuite.AnyFunSuite

/** P5/P6 validation laws (reference tests/test_api.py:142-145 422 paths). */
class QueryParamsSpec extends AnyFunSuite {

  test("symbol validation: letters only, 1-10 chars, uppercased") {
    assert(QueryParams.validateSymbol("aapl") == Right("AAPL"))
    assert(QueryParams.validateSymbol("MSFT") == Right("MSFT"))
    assert(QueryParams.validateSymbol("").isLeft)
    assert(QueryParams.validateSymbol("ABC123").isLeft)
    assert(QueryParams.validateSymbol("ELEVENCHARS").isLeft)
    assert(QueryParams.validateSymbol("AA PL").isLeft)
  }

  test("range validation mirrors the endpoint caps") {
    assert(QueryParams.validateLimit(100, QueryParams.TicksLimitMax) == Right(100))
    assert(QueryParams.validateLimit(101, QueryParams.TicksLimitMax).isLeft)
    assert(QueryParams.validateLimit(0, QueryParams.MoversLimitMax).isLeft)
    assert(QueryParams.validateMinutes(1440) == Right(1440))
    assert(QueryParams.validateMinutes(1441).isLeft)
  }

  test("404-on-empty rule: zero-count summary is a named absence (ticks.py:86-90)") {
    assert(QueryParams.requireData(3, "symbol 'AAPL' in the last 60 minutes") == Right(3L))
    val miss = QueryParams.requireData(0, "symbol 'AAPL' in the last 60 minutes")
    assert(miss.isLeft)
    assert(miss.left.exists(_.contains("not found")))
  }
}
