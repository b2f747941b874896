package graft

import org.apache.spark.sql.functions._
import graft.ext.{Drift, DriftProfile}

class DriftProfileSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-driftprof-spec")
      .resolve("p.json").toString

  test("numeric profile save/load serves hash-identically to two-sided psi") {
    val ref = (1 to 400).map(i => i.toDouble).toDF("v")
    val cur = (1 to 400).map(i => (i * i % 397).toDouble).toDF("v")
    val direct = Drift.psi(ref, cur, "v", bins = 8).orderBy("bin").collect()
    val prof = DriftProfile.fit(ref, numericCols = Seq("v"), bins = 8)
    val path = tmp()
    prof.save(path)
    val n = DriftProfile.load(path).numericFor("v")
    assert(n.edges == prof.numericFor("v").edges)   // exact double round-trip
    assert(n.fracs == prof.numericFor("v").fracs)
    val served = Drift.psiAgainstProfile(cur, "v", n.edges, n.fracs)
      .orderBy("bin").collect()
    assert(served.toSeq == direct.toSeq)
  }

  test("categorical profile save/load serves hash-identically to two-sided psi") {
    val ref = Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(15)("fr") ++
      Seq.fill(5)("el")
    val cur = Seq.fill(20)("en") ++ Seq.fill(40)("de") ++ Seq.fill(10)("xx")
    val refDf = ref.toDF("lang")
    val curDf = cur.toDF("lang")
    val direct = Drift.psiCategorical(refDf, curDf, "lang", maxCategories = 3)
      .orderBy("cell").collect()
    val prof = DriftProfile.fit(refDf, categoricalCols = Seq("lang"),
      maxCategories = 3)
    val path = tmp()
    prof.save(path)
    val c = DriftProfile.load(path).categoricalFor("lang")
    val served = Drift.psiCategoricalAgainstProfile(curDf, "lang",
      c.cells, c.fracs).orderBy("cell").collect()
    assert(served.toSeq == direct.toSeq)
  }

  test("profile document validation: format sentinel, shape requires, missing column") {
    val prof = DriftProfile.fit(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"),
      numericCols = Seq("v"), bins = 2)
    intercept[IllegalArgumentException] {
      DriftProfile.fromJson("""{"format": "something-else"}""")
    }
    intercept[IllegalArgumentException](prof.numericFor("nope"))
    intercept[IllegalArgumentException](prof.categoricalFor("v"))
    intercept[IllegalArgumentException](
      DriftProfile.NumericColumn("v", Seq(1.0), Seq(0.5))) // fracs != edges+1
    intercept[IllegalArgumentException](
      Drift.psiCategoricalAgainstProfile(Seq("a").toDF("c"), "c",
        Seq("a", "__other__"), Seq(0.5, 0.4, 0.1)))
  }
}
