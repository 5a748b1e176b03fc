package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension injector: enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * to make `extract_main_text` available to plain `spark.sql(...)` on a
  * 1000-executor cluster without any imperative setup — the idiomatic
  * deployment path for a shared library (SURVEY §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (ExtractMainText.fnName, ExtractMainText.fnInfo, ExtractMainText.builder))
    ext.injectFunction(
      (TokenSortRatio.fnName, TokenSortRatio.fnInfo, TokenSortRatio.builder))
    ext.injectFunction(
      (ExtractDoc.fnName, ExtractDoc.fnInfo, ExtractDoc.builder))
    ext.injectFunction(
      (SimHash64.fnName, SimHash64.fnInfo, SimHash64.builder))
    ext.injectFunction(
      (MinHashBands.fnName, MinHashBands.fnInfo, MinHashBands.builder))
    ext.injectFunction(
      (NfcNormalize.fnName, NfcNormalize.fnInfo, NfcNormalize.builder))
    ext.injectFunction(
      (PorterStem.fnName, PorterStem.fnInfo, PorterStem.builder))
  }
}
