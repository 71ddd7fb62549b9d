package graft.sources

import java.time.LocalDate
import java.util
import graft.energy.SyntheticPayloads
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the Energy-Charts feed: the Spark-native
  * shape of the reference's driver-side ingestion loop (SURVEY.md §2 S1 /
  * `api_client.py` + `power_ingestion.py:31-45`). One input partition per
  * day per dataset, so a month's backfill fans out across the cluster
  * instead of looping on the driver; each partition reader produces that
  * day's bronze row (key, date, payload_json).
  *
  * The environment is zero-egress, so readers generate the deterministic
  * synthetic payloads ([[SyntheticPayloads]]); a live deployment swaps the
  * payload call for the HTTP fetch — partitioning, pushdown, and schema
  * stay identical.
  *
  * Usage:
  * {{{
  * spark.read.format("energy-charts")
  *   .option("dataset", "power")          // power | price
  *   .option("start", "2025-01-01").option("end", "2025-01-07")
  *   .load()
  * }}}
  *
  * Supports column pruning and date-filter pushdown: `WHERE date = ...` /
  * range predicates narrow the planned partitions (verified in
  * `EnergyChartsSourceSpec`).
  */
class EnergyChartsSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "energy-charts"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EnergyChartsSource.schemaFor(options.getOrDefault("dataset", "power"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String],
  ): Table = new EnergyChartsTable(new CaseInsensitiveStringMap(properties))
}

object EnergyChartsSource {
  /** Normalize + validate the dataset option: typos must fail loudly, not
    * silently fall back to the power dataset.
    */
  def datasetOf(raw: String): String = raw.toLowerCase match {
    case d @ ("power" | "price") => d
    case other =>
      throw new IllegalArgumentException(
        s"unknown dataset '$other' for format energy-charts (expected power | price)")
  }

  def schemaFor(dataset: String): StructType = {
    val keyCol = if (datasetOf(dataset) == "price") "market" else "country"
    StructType(Seq(
      StructField(keyCol, StringType, nullable = false),
      StructField("date", StringType, nullable = false),
      StructField("payload_json", StringType, nullable = true),
    ))
  }
}

final class EnergyChartsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val dataset = EnergyChartsSource.datasetOf(options.getOrDefault("dataset", "power"))

  override def name(): String = s"energy_charts_$dataset"
  override def schema(): StructType = EnergyChartsSource.schemaFor(dataset)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new EnergyChartsScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class EnergyChartsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val dataset = EnergyChartsSource.datasetOf(options.getOrDefault("dataset", "power"))
  private val key =
    options.getOrDefault("key", if (dataset == "price") "DE-LU" else "de")
  private var lo = LocalDate.parse(options.getOrDefault("start", "2025-01-01"))
  private var hi = LocalDate.parse(options.getOrDefault("end", "2025-01-07"))
  private var pushed = Array.empty[Filter]
  private var required: StructType = EnergyChartsSource.schemaFor(dataset)

  private def isoDate(v: Any): Boolean = v match {
    case s: String => scala.util.Try(LocalDate.parse(s)).isSuccess
    case _ => false
  }

  /** Date predicates with parseable ISO literals narrow [lo, hi];
    * everything else — including legal-but-non-ISO string comparisons
    * like `date > 'abc'` — stays residual rather than crashing planning.
    * (Dates are ISO strings, so lexicographic comparisons are date
    * comparisons.)
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("date", v) => isoDate(v)
      case GreaterThan("date", v) => isoDate(v)
      case GreaterThanOrEqual("date", v) => isoDate(v)
      case LessThan("date", v) => isoDate(v)
      case LessThanOrEqual("date", v) => isoDate(v)
      case _ => false
    }
    accepted.foreach {
      case EqualTo("date", v: String) =>
        val d = LocalDate.parse(v)
        if (d.isAfter(lo)) lo = d
        if (d.isBefore(hi)) hi = d
      case GreaterThan("date", v: String) =>
        val d = LocalDate.parse(v).plusDays(1)
        if (d.isAfter(lo)) lo = d
      case GreaterThanOrEqual("date", v: String) =>
        val d = LocalDate.parse(v)
        if (d.isAfter(lo)) lo = d
      case LessThan("date", v: String) =>
        val d = LocalDate.parse(v).minusDays(1)
        if (d.isBefore(hi)) hi = d
      case LessThanOrEqual("date", v: String) =>
        val d = LocalDate.parse(v)
        if (d.isBefore(hi)) hi = d
      case _ => ()
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new EnergyChartsScan(dataset, key, lo, hi, required)
}

final class EnergyChartsScan(
    dataset: String,
    key: String,
    lo: LocalDate,
    hi: LocalDate,
    required: StructType,
) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"EnergyCharts dataset=$dataset range=[$lo..$hi] columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    if (lo.isAfter(hi)) Array.empty
    else lo.datesUntil(hi.plusDays(1)).iterator().asScala
      .map(d => EnergyDayPartition(dataset, key, d.toString): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new EnergyChartsReaderFactory(required.fieldNames)
}

final case class EnergyDayPartition(dataset: String, key: String, date: String)
    extends InputPartition

final class EnergyChartsReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EnergyDayPartition]
    new PartitionReader[InternalRow] {
      // next() advances (one row per partition); get() is a pure read so
      // repeated next() calls without get() terminate per the contract.
      private var served = false
      override def next(): Boolean = if (served) false else { served = true; true }
      override def get(): InternalRow = {
        lazy val payload =
          if (p.dataset == "price") SyntheticPayloads.pricePayload(LocalDate.parse(p.date))
          else SyntheticPayloads.powerPayload(LocalDate.parse(p.date))
        val values = columns.map {
          case "date" => UTF8String.fromString(p.date)
          case "payload_json" => UTF8String.fromString(payload)
          case _ => UTF8String.fromString(p.key) // the key column (country|market)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
