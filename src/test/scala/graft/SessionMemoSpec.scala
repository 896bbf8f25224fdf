package graft

/** Contract of the centralized session memo ([[SessionMemo]]): keyed by
  * the session OBJECT, so two live sessions can never observe each
  * other's entries (the identity-hash-collision bug class the
  * centralization removes), and `clear` really evicts.
  */
class SessionMemoSpec extends SparkTestBase {

  test("entries are isolated per session object, not per identity hash") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    assert(SessionMemo.getOrElseUpdate[String](s1, "t.ns", "/d")(build("a")) == "a")
    // same (ns, d) under a DIFFERENT session must not see s1's entry
    assert(SessionMemo.getOrElseUpdate[String](s2, "t.ns", "/d")(build("b")) == "b")
    // warm hits build nothing
    assert(SessionMemo.getOrElseUpdate[String](s1, "t.ns", "/d")(build("x")) == "a")
    assert(SessionMemo.getOrElseUpdate[String](s2, "t.ns", "/d")(build("y")) == "b")
    assert(builds == 2)
    SessionMemo.clear(s1)
    SessionMemo.clear(s2)
  }

  test("put/get/getOrElse round-trip and clear evicts") {
    val s = spark.newSession()
    assert(SessionMemo.get[Long](s, "t.n", "/d").isEmpty)
    SessionMemo.put(s, "t.n", "/d", 7L)
    assert(SessionMemo.get[Long](s, "t.n", "/d").contains(7L))
    assert(SessionMemo.getOrElse[Long](s, "t.n", "/other")(42L) == 42L)
    SessionMemo.clear(s)
    assert(SessionMemo.get[Long](s, "t.n", "/d").isEmpty)
  }

  test("namespaces do not collide on the same (session, dataset)") {
    val s = spark.newSession()
    SessionMemo.put(s, "ns.one", "/d", "first")
    SessionMemo.put(s, "ns.two", "/d", "second")
    assert(SessionMemo.get[String](s, "ns.one", "/d").contains("first"))
    assert(SessionMemo.get[String](s, "ns.two", "/d").contains("second"))
    SessionMemo.clear(s)
  }
}
