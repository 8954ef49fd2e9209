package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** Tag routing semantics ported from the reference's metadata tests
  * (flod metadata.d:387-448 end-to-end demo, metadata.d:102-125 routing). */
class TagChainSpec extends AnyFunSuite {

  test("accumulating chain: source → filter1 → filter1 → sink (metadata.d:441-448)") {
    val chain = new TagChain
    // positions: 0 source (setter), 1-2 filters (getter+setter), 3 sink (getter)
    chain.registerSetter(0, "foo")
    chain.registerGetter(1, "foo"); chain.registerSetter(1, "foo")
    chain.registerGetter(2, "foo"); chain.registerSetter(2, "foo")
    chain.registerGetter(3, "foo")
    // construction order source→sink, each filter reads then appends
    chain.set(0, "foo", "source")
    for (p <- Seq(1, 2)) {
      val seen = chain.get(p, "foo").get.asInstanceOf[String]
      chain.set(p, "foo", seen + ".filter1")
    }
    assert(chain.get(3, "foo").contains("source.filter1.filter1"))
  }

  test("last-setter-wins scoping: getter sees nearest upstream setter") {
    val chain = new TagChain
    chain.registerSetter(0, "k"); chain.registerSetter(2, "k")
    chain.registerGetter(1, "k"); chain.registerGetter(3, "k")
    chain.set(0, "k", "a"); chain.set(2, "k", "b")
    assert(chain.get(1, "k").contains("a"))
    assert(chain.get(3, "k").contains("b"))
  }

  test("onChange fires only on getters scoped to the setter, in order (pipeline.d:251-262)") {
    val chain = new TagChain
    val fired = scala.collection.mutable.ArrayBuffer.empty[(Int, Any)]
    chain.registerSetter(0, "k"); chain.registerSetter(3, "k")
    chain.registerGetter(2, "k", Some(v => fired += ((2, v))))
    chain.registerGetter(1, "k", Some(v => fired += ((1, v))))
    chain.registerGetter(4, "k", Some(v => fired += ((4, v))))
    chain.set(0, "k", "x")
    assert(fired.toSeq == Seq((1, "x"), (2, "x"))) // chain order, stops at setter 3
    fired.clear()
    chain.set(3, "k", "y")
    assert(fired.toSeq == Seq((4, "y")))
  }

  test("typed second tag on an independent key (metadata.d bar=31337)") {
    val chain = new TagChain
    chain.registerSetter(0, "bar"); chain.registerGetter(2, "bar")
    chain.set(0, "bar", 31337)
    assert(chain.get(2, "bar").contains(31337))
    assert(chain.get(2, "nope").isEmpty)
  }

  test("setting from a non-setter stage is rejected (traits.d negative tests analog)") {
    val chain = new TagChain
    chain.registerSetter(0, "k")
    assertThrows[IllegalArgumentException](chain.set(1, "k", "v"))
  }

  test("tags ride alongside a Flow pipeline (SURVEY §1.4 integration)") {
    import graft.core.Flow
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val chain = new TagChain
    // stage 0: source (sets name + encoding), 1: filter (reads, re-tags),
    // 2: sink (reads both)
    chain.registerSetter(0, "name"); chain.registerSetter(0, "encoding")
    chain.registerGetter(1, "name"); chain.registerSetter(1, "name")
    chain.registerGetter(2, "name"); chain.registerGetter(2, "encoding")

    chain.set(0, "name", "memsource"); chain.set(0, "encoding", "utf-8")
    val src = Flow.fromSeq(spark, Seq("a b", "c"))
    chain.set(1, "name", chain.get(1, "name").get + ".split")
    val out = src.flatMap(_.split(' ')).toArray

    assert(out == Seq("a", "b", "c"))
    assert(chain.get(2, "name").contains("memsource.split"))
    assert(chain.get(2, "encoding").contains("utf-8"))
  }

  test("schema-carrier tag survives select/filter/join/repartition (metadata.d:365-385)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val tagged = Tags.setTag(Tags.setTag(docs, "text", "encoding", "utf-8"),
      "text", "source", "memsource")

    val dim = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    val downstream = tagged
      .filter($"id" =!= 2L)
      .select($"id", $"text")
      .join(dim, "id")
      .repartition(4)
      .select($"text", $"lang")

    assert(Tags.getTag(downstream, "text", "encoding").contains("utf-8"))
    assert(Tags.getTag(downstream, "text", "source").contains("memsource"))
    assert(Tags.tags(downstream, "text") ==
      Map("encoding" -> "utf-8", "source" -> "memsource"))
    // the untagged join side carries nothing
    assert(Tags.getTag(downstream, "lang", "encoding").isEmpty)
    // last-setter-wins on re-tag (nearest-upstream-setter on a linear chain)
    val retagged = Tags.setTag(downstream, "text", "source", "memsource.join")
    assert(Tags.getTag(retagged, "text", "source").contains("memsource.join"))
    // values still flow, tag plumbing is zero-cost schema metadata
    assert(retagged.count() == 2)
  }

  test("row-envelope tag changes mid-stream and rides through a shuffle") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two "sources" with different tag values unioned into one stream —
    // the flod onChange case: the tag value changes at a stream position,
    // so it must ride per-row to stay correct after partition interleave
    val a = Tags.setRowTag(Seq("x", "y").toDF("v"), "file", lit("part-0"))
    val b = Tags.setRowTag(Seq("z").toDF("v"), "file", lit("part-1"))
    val stream = a.unionByName(b).repartition(5) // interleave partitions
    val got = stream.select($"v", Tags.rowTag("file").as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("x" -> "part-0", "y" -> "part-0", "z" -> "part-1"))
    // overwrite replaces, not duplicates, the key
    val re = Tags.setRowTag(stream, "file", lit("re"))
    assert(re.select(Tags.rowTag("file")).distinct().collect().map(_.getString(0)).toSeq == Seq("re"))
    assert(Tags.dropRowTags(re).columns.toSeq == Seq("v"))
  }

  test("row-tag write survives NULL envelopes from outer joins/unions") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // allowMissingColumns union leaves _tags NULL on the untagged side;
    // a subsequent write must land on those rows, not vanish into
    // map_concat(NULL, ...) = NULL
    val tagged = Tags.setRowTag(Seq("x").toDF("v"), "file", lit("part-0"))
    val untagged = Seq("y").toDF("v")
    val mixed = tagged.unionByName(untagged, allowMissingColumns = true)
    val re = Tags.setRowTag(mixed, "file", lit("all"))
    val got = re.select($"v", Tags.rowTag("file").as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("x" -> "all", "y" -> "all"))
  }
}
