package graft.examples
import graft.queries.Td
import org.apache.spark.sql.SparkSession

/** r18: how much of a fast query's wall is repeated table-relation
  * construction (parquet footer/schema read + logical plan build) vs the
  * actual job? Times 50 repeated Td.table constructions and 10 repeated
  * tiny counts.
  */
object TableLoadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // warm
    Td.documents(spark, d).count()
    Td.events(spark, d).count()
    time("50x construct documents")((1 to 50).foreach(_ => Td.documents(spark, d)))
    time("50x construct events")((1 to 50).foreach(_ => Td.events(spark, d)))
    time("50x construct orders")((1 to 50).foreach(_ => Td.orders(spark, d)))
    time("10x documents.count")((1 to 10).foreach(_ => Td.documents(spark, d).count()))
    time("10x events.count")((1 to 10).foreach(_ => Td.events(spark, d).count()))
    spark.stop()
  }
}

/** Companion probe: repeated KeyedTable.current construction cost for the
  * maintained-state accessors (r18 "not yet optimized" candidate).
  */
object KtLoadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    Td.cdcOrdersTable(spark, d).current.count() // install + warm
    Td.scd2OrdersTable(spark, d).current.count()
    time("20x cdcOrders.current construct")(
      (1 to 20).foreach(_ => Td.cdcOrdersTable(spark, d).current))
    time("20x scd2Orders.current construct")(
      (1 to 20).foreach(_ => Td.scd2OrdersTable(spark, d).current))
    time("5x cdcOrders.current.count")(
      (1 to 5).foreach(_ => Td.cdcOrdersTable(spark, d).current.count()))
    spark.stop()
  }
}
