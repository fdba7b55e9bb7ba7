"""Per-provider nested schema: the reference's 3-level carbon-accounting
shape (``DEWA_Schema.json:3-48`` / ``SEWA_Schema.json``) built from the
flat extraction field columns as one pure-JVM ``struct`` expression —
no arrays-of-maps, fully Arrow/parquet-compatible (SURVEY.md §1.2), so
the nested table writes/scans columnar with per-leaf pruning.

The leaf mapping: flat field -> DEWA_Schema path
  account_number   -> extractedData.billInfo.accountNumber
  billing_period   -> extractedData.billInfo.billingPeriod.{startDate,endDate}
  bill_date        -> extractedData.billInfo.billDate
  electricity_kwh  -> extractedData.consumptionData.electricity.value
  current/previous_reading -> ...electricity.meterReading.{current,previous}
  water_m3         -> extractedData.consumptionData.water.value
  carbon_kg_co2e   -> extractedData.emissionsData.scope2.totalCO2e.value
                      (+ breakdown.electricity, DEWA_Schema.json:37-46)
  confidence       -> validation.confidence (DEWA_Schema.json:50-53)
  url              -> metadata.sourceDocument
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

PROVIDER_NAMES = {
    "DEWA": "Dubai Electricity and Water Authority (DEWA)",
    "SEWA": "Sharjah Electricity and Water Authority (SEWA)",
}


def nested_bill_struct(confidence_col: str = "confidence",
                       url_col: str = "url") -> Column:
    """The nested utility-bill document as a single struct column over
    an extractions DataFrame (needs the flat field columns + provider +
    confidence). Missing fields stay null at their leaf — the struct
    skeleton itself is always present, like the reference's schema-first
    JSON envelope."""
    period = F.split(F.col("billing_period"), " to ")
    provider_name = (
        F.when(F.col("provider") == "DEWA", F.lit(PROVIDER_NAMES["DEWA"]))
         .when(F.col("provider") == "SEWA", F.lit(PROVIDER_NAMES["SEWA"]))
         .otherwise(F.lit("Unknown")))
    needs_manual = (F.col("account_number").isNull()
                    | F.col("total_amount").isNull()
                    | F.col("electricity_kwh").isNull())
    return F.struct(
        F.lit("utility_bill").alias("documentType"),
        F.struct(
            F.struct(
                provider_name.alias("providerName"),
                F.col("account_number").alias("accountNumber"),
                F.struct(
                    period.getItem(0).alias("startDate"),
                    period.getItem(1).alias("endDate"),
                    F.lit("Monthly").alias("periodicity"),
                ).alias("billingPeriod"),
                F.col("bill_date").alias("billDate"),
            ).alias("billInfo"),
            F.struct(
                F.struct(
                    F.col("electricity_kwh").cast("double").alias("value"),
                    F.lit("kWh").alias("unit"),
                    F.struct(
                        F.col("current_reading").cast("string")
                         .alias("current"),
                        F.col("previous_reading").cast("string")
                         .alias("previous"),
                        F.lit("actual").alias("readingType"),
                    ).alias("meterReading"),
                ).alias("electricity"),
                F.struct(
                    F.col("water_m3").cast("double").alias("value"),
                    F.lit("m3").alias("unit"),
                ).alias("water"),
            ).alias("consumptionData"),
            F.struct(
                F.struct(
                    F.struct(
                        F.col("carbon_kg_co2e").cast("double")
                         .alias("value"),
                        F.lit("kgCO2e").alias("unit"),
                    ).alias("totalCO2e"),
                    F.struct(
                        F.col("carbon_kg_co2e").cast("double")
                         .alias("electricity"),
                    ).alias("breakdown"),
                ).alias("scope2"),
            ).alias("emissionsData"),
        ).alias("extractedData"),
        F.struct(
            F.col(confidence_col).alias("confidence"),
            F.lit("densitometric_regex").alias("extractionMethod"),
            needs_manual.alias("manualVerificationRequired"),
        ).alias("validation"),
        F.struct(F.col(url_col).alias("sourceDocument")).alias("metadata"),
    )
