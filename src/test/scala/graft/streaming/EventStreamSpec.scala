package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {
  import EventStream._

  test("streaming hourly windowed agg equals the batch twin (memory sink)") {
    val dir = sf("sf0.001") + "/events.parquet"
    val q = hourlyCounts(spark, sf("sf0.001")).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT hour, event_type, n, round(v_sum, 6) AS v FROM hourly_out ORDER BY hour, event_type")
      .collect().toSeq
    val batch = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("v"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed === batch)
  }

  test("flatMapGroupsWithState sessionization equals batch twin (closed sessions)") {
    import spark.implicits._
    val dir = sf("sf0.001") + "/events.parquet"
    val ev = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]

    // streaming op driven in batch mode: same function over a grouped Dataset
    val streamedStyle = sessionize(spark, ev)
      .collect().map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
        math.round(s.v_sum * 1e6))).toSet

    val batchAll = sessionizeBatch(spark, ev.toDF())
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("v_sum") * 1e6).cast("long").as("v"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Int, Long)]
      .collect()
    // streaming emits only CLOSED sessions; the batch twin also reports each
    // user's final (still-open) session — drop those before comparing
    val lastPerUser = batchAll.groupBy(_._1).view
      .mapValues(_.maxBy(_._2.getTime)).values.toSet
    val closed = batchAll.filterNot(lastPerUser.contains)
      .map(t => (t._1, t._2, t._3, t._4, t._5)).toSet
    assert(streamedStyle === closed)
    assert(streamedStyle.nonEmpty)
  }
}
