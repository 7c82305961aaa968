package graft

import graft.sources.TickGenerator
import graft.streaming.{IngestPipeline, KafkaIO}
import org.apache.spark.sql.functions._

/** Broker-contract simulation for the Kafka wire tier (S4/S5).
  *
  * The container ships no Kafka broker and no spark-sql-kafka connector
  * jar, so `readTickStream`/`writeTickStream` cannot run end-to-end here
  * (documented gap — PLANS.md "Kafka live-broker gap"). What a broker
  * GUARANTEES, however, is public contract: the default partitioner maps
  * a record to `toPositive(murmur2(keyBytes)) % numPartitions`, and each
  * partition is FIFO. This spec simulates exactly that contract over
  * `encodeTicks`' output and verifies the property the reference's
  * consumer test asserts (tests/test_consumer.py:144-149): with key =
  * symbol, every symbol's ticks land in ONE partition and arrive in
  * producer order — so a per-partition consumer sees per-symbol order.
  */
class KafkaIOSpec extends SparkSpec {

  /** murmur2 over key bytes — the Apache Kafka default-partitioner hash
    * (public algorithm, org.apache.kafka.common.utils.Utils.murmur2);
    * re-implemented here so the simulation is faithful to a real broker's
    * key→partition placement, not just "some deterministic hash".
    */
  private def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m    = 0x5bd1e995
    val r    = 24
    var h    = seed ^ data.length
    val n4   = data.length / 4
    var i    = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tail = data.length & ~3
    (data.length % 4: @unchecked) match {
      case 3 =>
        h ^= (data(tail + 2) & 0xff) << 16
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 2 =>
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 1 =>
        h ^= data(tail) & 0xff; h *= m
      case 0 =>
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  private def kafkaPartition(key: String, numPartitions: Int): Int =
    (murmur2(key.getBytes("UTF-8")) & 0x7fffffff) % numPartitions

  private val NumPartitions = 3 // the reference topic's partition count

  test("keyed wire: per-symbol order survives the 3-partition broker contract") {
    val ticks = TickGenerator.batch(spark, 3000)
    // producer order: batch emits one tick per interval, so event_time is
    // globally strictly increasing — sorting by it recovers emit order.
    // The time is read back OUT of the wire value (not joined from the
    // source frame), so the test sees exactly what a consumer would; the
    // fixed-format UTC ISO string sorts chronologically.
    val rows = KafkaIO.encodeTicks(ticks)
      .select(col("key"), get_json_object(col("value"), "$.event_time").as("et"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._2)

    // broker simulation: default-partitioner placement + per-partition FIFO
    val placed = rows.map { case (sym, t) => (kafkaPartition(sym, NumPartitions), sym, t) }

    // every symbol maps to exactly one partition (keyed placement)
    val partsPerSymbol = placed.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length)
    assert(partsPerSymbol.values.forall(_ == 1), partsPerSymbol.toMap.toString)
    // the 5 symbols actually spread over >1 of the 3 partitions
    assert(placed.map(_._1).distinct.length > 1)

    // per partition, in FIFO order, each symbol's event times are strictly
    // increasing — the consumer-side per-symbol ordering guarantee
    placed.groupBy(_._1).foreach { case (_, partRecords) =>
      partRecords.groupBy(_._2).foreach { case (sym, recs) =>
        val times = recs.map(_._3)
        assert(times.zip(times.tail).forall { case (a, b) => a < b },
          s"out-of-order ticks for $sym")
      }
    }
  }

  test("wire round-trip: encode → broker metadata → decode → parse, zero DLQ") {
    val ticks = TickGenerator.batch(spark, 500)
    val part  = udf((k: String) => kafkaPartition(k, NumPartitions))
    // what a consumer poll returns: value + topic/partition/offset metadata
    val records = KafkaIO.encodeTicks(ticks)
      .withColumn("topic", lit("stock.ticks.v1"))
      .withColumn("partition", part(col("key")))
      .withColumn("offset", monotonically_increasing_id())
    val parsed = IngestPipeline.parse(KafkaIO.decodeRecords(records))

    assert(IngestPipeline.failedEvents(parsed).isEmpty)
    val back = IngestPipeline.validTicks(parsed)
    assert(back.count() == 500)
    // field-level equality against the pre-wire frame
    val orig = ticks.select("symbol", "price", "volume", "event_time")
    assert(back.select("symbol", "price", "volume", "event_time")
      .exceptAll(orig).isEmpty)
    assert(orig.exceptAll(
      back.select("symbol", "price", "volume", "event_time")).isEmpty)
  }
}
