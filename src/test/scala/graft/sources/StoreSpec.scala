package graft.sources

import graft.SparkSpec
import graft.etl.MovieLens
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StoreSpec extends SparkSpec {

  private val moviesSchema = StructType(Seq(
    StructField("movieId", IntegerType),
    StructField("title", StringType),
    StructField("release_date", StringType),
    StructField("genres", ArrayType(StringType))))

  test("bulk write enforces the declared mapping and round-trips bucketed") {
    val movies = MovieLens.movies(spark)
    assert(Store.conforms(movies, moviesSchema))
    Store.bulkWrite(movies, "movies_idx", "movieId", Some(moviesSchema), buckets = 4)
    try {
      val back = Store.read(spark, "movies_idx")
      assert(back.count() === 1682L)
      // bucketed point lookup matches (ES _id get analog)
      val t = back.filter(col("movieId") === 1).select("title").head().getString(0)
      assert(t === "Toy Story (1995)")
    } finally spark.sql("DROP TABLE IF EXISTS movies_idx")
  }

  test("non-conforming frame is rejected before any write") {
    val wrong = MovieLens.movies(spark).withColumn("movieId", col("movieId").cast("long"))
    assertThrows[IllegalArgumentException] {
      Store.bulkWrite(wrong, "movies_bad", "movieId", Some(moviesSchema))
    }
    assert(!spark.catalog.tableExists("movies_bad"))
  }

  test("upsert replaces same-key rows and appends new keys (S7 id semantics)") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Store.bulkWrite(v1, "upsert_t", "k", buckets = 2)
    try {
      val updates = Seq((2L, "B2"), (3L, "c")).toDF("k", "v")
      Store.upsert(spark, "upsert_t", updates, "k", buckets = 2)
      val got = Store.read(spark, "upsert_t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS upsert_t")
      spark.sql("DROP TABLE IF EXISTS upsert_t__staged")
    }
  }

  test("createTable declares an empty table with the mapping (S6)") {
    Store.createTable(spark, "movies_decl", moviesSchema)
    try {
      val t = Store.read(spark, "movies_decl")
      assert(t.schema === moviesSchema)
      assert(t.count() === 0L)
    } finally spark.sql("DROP TABLE IF EXISTS movies_decl")
  }

  test("point lookup on the bucket key prunes to one bucket (ES _id routing analog)") {
    import spark.implicits._
    val recs = (1 to 200).map(u => (u, u * 7, u / 10.0f))
      .toDF("userId", "movieId", "predicted_rating")
    Store.bulkWrite(recs, "recs_bucketed", "userId", buckets = 16)
    try {
      val one = Store.read(spark, "recs_bucketed").filter(col("userId") === 42)
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 16"),
        s"bucket pruning did not engage:\n$scan")
      assert(one.count() === 1L)
    } finally spark.sql("DROP TABLE IF EXISTS recs_bucketed")
  }
}
