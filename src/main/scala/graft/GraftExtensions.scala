package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSim, NgramHashSeq, NgramHashes, PolyHash, RhSig, SimHash62, TextStats}

/** Session extensions: registers graft's native Catalyst expressions
  * and optimizer rules. Activated via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession.tune
  * sets this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((CosineSim.identifier, CosineSim.info, CosineSim.builder))
    ext.injectFunction((PolyHash.identifier, PolyHash.info, PolyHash.builder))
    ext.injectFunction((RhSig.identifier, RhSig.info, RhSig.builder))
    ext.injectFunction((NgramHashes.identifier, NgramHashes.info, NgramHashes.builder))
    ext.injectFunction((NgramHashSeq.identifier, NgramHashSeq.info, NgramHashSeq.builder))
    ext.injectFunction((SimHash62.identifier, SimHash62.info, SimHash62.builder))
    ext.injectFunction((TextStats.identifier, TextStats.info, TextStats.builder))
    ext.injectOptimizerRule(_ => graft.plans.RewriteTopOnePerKey)
  }
}
