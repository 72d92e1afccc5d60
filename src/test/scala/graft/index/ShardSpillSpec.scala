package graft.index

import graft.SparkSpec

/** Contract tests for the executor-local disk tier under the shard cache
  * (GraphShardCache + the per-engine SpillCodecs): the round-7 serializable-
  * codec bug shipped exactly because this tier had no direct coverage. */
class ShardSpillSpec extends SparkSpec {

  private def vamanaShard(n: Int, dim: Int, seed: Int): Vamana.Shard = {
    val r = new scala.util.Random(seed)
    val ids = Array.tabulate(n)(i => 1000L + i)
    val vecs = Array.fill(n)(Array.fill(dim)(r.nextFloat()))
    Vamana.buildShard(ids, vecs,
      Vamana.Params(maxDegree = 8, buildComplexity = 16, alpha = 1.2), "l2")
  }

  private def sameVamana(a: Vamana.Shard, b: Vamana.Shard): Boolean =
    a.entry == b.entry &&
      a.ids.sameElements(b.ids) &&
      a.vectors.length == b.vectors.length &&
      a.vectors.indices.forall(i => a.vectors(i).sameElements(b.vectors(i))) &&
      a.neighbors.length == b.neighbors.length &&
      a.neighbors.indices.forall(i => a.neighbors(i).sameElements(b.neighbors(i)))

  test("vamana codec round-trips a shard bit-exactly") {
    val sh = vamanaShard(64, 16, 7)
    val bos = new java.io.ByteArrayOutputStream()
    Vamana.ShardSpillCodec.write(sh, new java.io.DataOutputStream(bos))
    val back = Vamana.ShardSpillCodec.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))).asInstanceOf[Vamana.Shard]
    assert(sameVamana(sh, back))
  }

  test("hnsw codec round-trips a shard bit-exactly") {
    val r = new scala.util.Random(9)
    val ids = Array.tabulate(40)(i => 2000L + i)
    val vecs = Array.fill(40)(Array.fill(8)(r.nextFloat()))
    val sh = Hnsw.buildShard(ids, vecs,
      Hnsw.Params(m = 4, efConstruction = 16), "l2")
    val bos = new java.io.ByteArrayOutputStream()
    Hnsw.ShardSpillCodec.write(sh, new java.io.DataOutputStream(bos))
    val back = Hnsw.ShardSpillCodec.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))).asInstanceOf[Hnsw.Shard]
    assert(back.entry == sh.entry && back.maxLevel == sh.maxLevel)
    assert(back.ids.sameElements(sh.ids))
    assert(back.levels.sameElements(sh.levels))
    assert(sh.vectors.indices.forall(i => back.vectors(i).sameElements(sh.vectors(i))))
    assert(sh.neighbors.indices.forall { i =>
      sh.neighbors(i).length == back.neighbors(i).length &&
        sh.neighbors(i).indices.forall(l =>
          sh.neighbors(i)(l).sameElements(back.neighbors(i)(l)))
    })
  }

  test("spill tier serves reloads after the soft references are cleared") {
    // spillDir resolves lazily off SparkEnv — make sure a session is up
    spark.sparkContext
    val sh = vamanaShard(32, 8, 11)
    var builds = 0
    val key = s"spillspec-${System.nanoTime()}#0"
    val first = GraphShardCache.getOrBuild(key, Some(Vamana.ShardSpillCodec)) {
      builds += 1; sh
    }
    assert(builds == 1 && (first eq sh))
    // warm in-memory hit: no rebuild, no disk read
    val hit = GraphShardCache.getOrBuild(key, Some(Vamana.ShardSpillCodec)) {
      builds += 1; sh
    }
    assert(builds == 1 && (hit eq sh))
    // simulate GC clearing the SoftReferences: the next get must come back
    // from the disk tier (spillReloads increments), NOT rebuild
    GraphShardCache.clearSoftRefsForTest()
    val reloadsBefore = GraphShardCache.spillReloads.get()
    val reloaded = GraphShardCache.getOrBuild(key, Some(Vamana.ShardSpillCodec)) {
      builds += 1; sh
    }.asInstanceOf[Vamana.Shard]
    assert(builds == 1, "spill reload must not re-run the build")
    assert(GraphShardCache.spillReloads.get() == reloadsBefore + 1)
    assert(sameVamana(sh, reloaded))
  }

  test("spill codecs are serializable singletons (ride in task closures)") {
    def roundTrip(v: AnyRef): AnyRef = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(v); oos.close()
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
    }
    // Scala objects extending Serializable resolve back to the module
    assert(roundTrip(Vamana.ShardSpillCodec).asInstanceOf[AnyRef]
      eq Vamana.ShardSpillCodec)
    assert(roundTrip(Hnsw.ShardSpillCodec).asInstanceOf[AnyRef]
      eq Hnsw.ShardSpillCodec)
    assert(roundTrip(Some(Vamana.ShardSpillCodec)) == Some(Vamana.ShardSpillCodec))
  }
}
