package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelper.check
import graft.operators.Contracts

/** Column-order contracts (O6) — pure header arithmetic, no Spark. Order is
  * part of correctness: the reference's consumers index by position
  * (.DevContext/CRITICAL-START-HERE.md:29-62). */
class ContractsSpec extends AnyFunSuite {

  test("transaction contract pins the full base column order (v3:145-162)") {
    val got = Contracts.transactionHeaders(Contracts.transactionBase)
    assert(got == Contracts.transactionBase)
    assert(got.length == 28)
  }

  test("redundant accountDisplayName/accountId are dropped (P5, v3:167-169)") {
    val got = Contracts.transactionHeaders(
      Seq("id", "amount", "accountDisplayName", "accountId", "date"))
    assert(!got.contains("accountDisplayName") && !got.contains("accountId"))
    assert(got == Seq("amount", "date", "id"))
  }

  test("unexpected transaction columns append sorted after the base (v3:175-176)") {
    val got = Contracts.transactionHeaders(Seq("zed", "id", "alpha", "amount"))
    assert(got == Seq("amount", "id", "alpha", "zed"))
  }

  test("account priority columns lead, remainder sorted, type before subtype (v3:97-127)") {
    val present = Seq("subtype", "mask", "type", "id", "displayName", "zz",
      "currentBalance", "TypeDisplay", "AccountType", "InstitutionName", "displayBalance")
    val got = Contracts.accountHeaders(present)
    assert(got.take(7) == Contracts.accountPriority)
    assert(got.drop(7) == Seq("mask", "type", "subtype", "zz"))
  }

  test("type/subtype insertion lands at type's alphabetical slot") {
    // every remaining key < "type": pair appends at the end
    assert(Contracts.accountHeaders(Seq("id", "alpha", "beta", "type", "subtype")) ==
      Seq("id", "alpha", "beta", "type", "subtype"))
    // a key sorting after "type" pushes the pair before it
    assert(Contracts.accountHeaders(Seq("id", "alpha", "zeta", "type", "subtype")) ==
      Seq("id", "alpha", "type", "subtype", "zeta"))
  }

  test("without both type and subtype, plain sorted remainder applies") {
    assert(Contracts.accountHeaders(Seq("id", "type", "beta")) == Seq("id", "beta", "type"))
    assert(Contracts.accountHeaders(Seq("id", "subtype", "beta")) == Seq("id", "beta", "subtype"))
  }

  test("budget contract pins the 31-column order (v3:886-894)") {
    val got = Contracts.budgetHeaders(Contracts.budgetPriority)
    assert(got == Contracts.budgetPriority)
    assert(got.length == 31)
  }

  private val txnKeyGen: Gen[Seq[String]] =
    Gen.someOf(Contracts.transactionBase ++ Seq("extra1", "zzz", "aaa", "accountId"))
      .map(_.toSeq)

  test("property: transaction headers = present minus dropped, base-stable, extras sorted last") {
    check(Prop.forAll(txnKeyGen) { present =>
      val got = Contracts.transactionHeaders(present)
      val expectedSet = present.toSet -- Contracts.transactionDropped
      val baseGot = got.filter(Contracts.transactionBase.contains)
      val extras = got.filterNot(Contracts.transactionBase.contains)
      got.toSet == expectedSet &&
        got.distinct == got &&
        baseGot == Contracts.transactionBase.filter(baseGot.toSet) &&
        extras == extras.sorted &&
        got == baseGot ++ extras
    })
  }

  test("property: account headers keep every present key exactly once; subtype follows type") {
    val accGen = Gen.someOf(Contracts.accountPriority ++
      Seq("type", "subtype", "mask", "order", "zz", "__typename")).map(_.toSeq)
    check(Prop.forAll(accGen) { present =>
      val got = Contracts.accountHeaders(present)
      val once = got.sorted == present.distinct.sorted
      val pair =
        if (present.contains("type") && present.contains("subtype"))
          got.indexOf("subtype") == got.indexOf("type") + 1
        else true
      once && pair
    })
  }
}
