package graft.energy

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end Medallion orchestration: Bronze ingest → Silver flatten →
  * Gold aggregates/join, mirroring `src/main.py:28-114` of the reference.
  */
final case class PipelineResult(
    bronzePowerRows: Long,
    bronzePriceRows: Long,
    silverPowerRows: Long,
    silverPriceRows: Long,
    goldPowerDaily: DataFrame,
    goldPriceDaily: DataFrame,
    goldJoin: DataFrame,
)

object EnergyPipeline {

  /** Bronze via the DataSource V2 connector instead of the driver-side
    * fetch loop: ingestion becomes a distributed scan (partition-per-day,
    * date pushdown) and the rest of the medallion flow is unchanged.
    * `EnergyPipelineSpec` asserts this path and [[run]] produce identical
    * gold tables.
    */
  def bronzeFromConnector(
      spark: SparkSession,
      cfg: EnergyConfig,
      dataset: String, // "power" | "price"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("energy-charts")
      .option("dataset", dataset)
      .option("start", cfg.backfill.startDate.toString)
      .option("end", cfg.backfill.endDate.toString)
      .load()
      .withColumn("ingested_at", current_timestamp())
      .withColumn("source", lit("energy-charts"))
  }

  def run(
      spark: SparkSession,
      cfg: EnergyConfig,
      src: EnergySource,
  ): PipelineResult = {
    val dates = Dates.dateRange(cfg.backfill.startDate, cfg.backfill.endDate)
    val country = cfg.datasets
      .find(_.endpoint == "public_power")
      .flatMap(_.params.get("country"))
      .getOrElse("de")
    val bzn = cfg.datasets
      .find(_.endpoint == "price")
      .flatMap(_.params.get("bzn"))
      .getOrElse("DE-LU")

    val bronzePowerPath = cfg.storage.bronze("power")
    val bronzePricePath = cfg.storage.bronze("price")
    val nPow = Bronze.ingestPower(spark, src, country, dates, bronzePowerPath)
    val nPri = Bronze.ingestPrice(spark, src, bzn, dates, bronzePricePath)

    // Every layer read resolves the latest COMMITTED snapshot
    // (AtomicLayer): overlapping runs cannot hand a half-written table
    // to the next stage.
    val silverPower = Silver.powerToSilver(AtomicLayer.read(spark, bronzePowerPath))
    val silverPrice = Silver.priceToSilver(AtomicLayer.read(spark, bronzePricePath))
    val silverPowerPath = cfg.storage.silver("power")
    val silverPricePath = cfg.storage.silver("price")
    Silver.write(silverPower, silverPowerPath, partitionCols = Seq("date"))
    Silver.write(silverPrice, silverPricePath)

    val sp = Silver.read(spark, silverPowerPath)
    val spr = Silver.read(spark, silverPricePath)
    val goldPower = Gold.powerDailyByType(sp)
    val goldPrice = Gold.priceDaily(spr)
    Gold.write(goldPower, cfg.storage.gold("power_daily_by_type"))
    Gold.write(goldPrice, cfg.storage.gold("price_daily"))
    val join = Gold.offshoreWindVsPrice(
      Gold.read(spark, cfg.storage.gold("power_daily_by_type")),
      Gold.read(spark, cfg.storage.gold("price_daily")),
    )
    Gold.write(join, cfg.storage.gold("power_price_daily"))

    PipelineResult(
      nPow,
      nPri,
      Silver.read(spark, silverPowerPath).count(),
      Silver.read(spark, silverPricePath).count(),
      Gold.read(spark, cfg.storage.gold("power_daily_by_type")),
      Gold.read(spark, cfg.storage.gold("price_daily")),
      Gold.read(spark, cfg.storage.gold("power_price_daily")),
    )
  }
}
