package graft

import graft.core.Confs

/** The shared strict-conf contract ([[graft.core.Confs]]): typo'd
  * values throw naming the key and the expected values; defaults are
  * implicitly allowed; booleans are case-insensitive (the
  * `--conf x=TRUE` tooling class that `parseBoolean` accepted before
  * the strict readers landed). */
class ConfsSpec extends SparkSpec {

  private val key = "graft.test.confsSpec"
  private def withConf[A](v: Option[String])(body: => A): A = {
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    try body finally spark.conf.unset(key)
  }

  test("enumConf: default when unset, default implicitly allowed, typo throws") {
    withConf(None) {
      assert(Confs.enumConf(spark, key, "parity", "free") == "parity")
    }
    // setting the DEFAULT explicitly must be accepted — the call sites
    // do not repeat the default inside the allowed list
    withConf(Some("parity")) {
      assert(Confs.enumConf(spark, key, "parity", "free") == "parity")
    }
    withConf(Some("free")) {
      assert(Confs.enumConf(spark, key, "parity", "free") == "free")
    }
    withConf(Some("fre")) {
      val ex = intercept[IllegalArgumentException] {
        Confs.enumConf(spark, key, "parity", "free")
      }
      assert(ex.getMessage.contains(key) && ex.getMessage.contains("'parity'")
        && ex.getMessage.contains("'free'"), ex.getMessage)
    }
  }

  test("boolConf: case-insensitive true/false, typo throws, never parseBoolean's silent false") {
    withConf(None)(assert(Confs.boolConf(spark, key, default = true)))
    for (v <- Seq("true", "TRUE", "True")) withConf(Some(v)) {
      assert(Confs.boolConf(spark, key, default = false))
    }
    for (v <- Seq("false", "FALSE", "False")) withConf(Some(v)) {
      assert(!Confs.boolConf(spark, key, default = true))
    }
    // the parseBoolean trap: 'ture' must throw, not silently disable
    withConf(Some("ture")) {
      val ex = intercept[IllegalArgumentException] {
        Confs.boolConf(spark, key, default = true)
      }
      assert(ex.getMessage.contains(key), ex.getMessage)
    }
  }

  test("intConf/parseInt: bounded parse, malformed and below-min name the key") {
    withConf(None)(assert(Confs.intConf(spark, key, 7) == 7))
    withConf(Some("12"))(assert(Confs.intConf(spark, key, 7) == 12))
    for (bad <- Seq("abc", "0", "-3", "1.5")) withConf(Some(bad)) {
      val ex = intercept[IllegalArgumentException] {
        Confs.intConf(spark, key, 7)
      }
      assert(ex.getMessage.contains(key) && ex.getMessage.contains(bad),
        ex.getMessage)
    }
    // the raw-value core shares the exact contract (env-var readers)
    assert(Confs.parseInt("SOME_ENV", "3") == 3)
    val ex = intercept[IllegalArgumentException](Confs.parseInt("SOME_ENV", "x"))
    assert(ex.getMessage.contains("SOME_ENV"))
  }
}
