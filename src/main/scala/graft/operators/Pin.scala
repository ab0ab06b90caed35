package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Explicit storage policy for reused corpus-scale intermediates.
  *
  * `Dataset.cache()` defaults to MEMORY_AND_DISK, which is already
  * spill-capable — but leaving the choice implicit hides the 100-TB
  * posture: a shingled corpus (tokens × shingle-width) does NOT fit
  * in executor memory at real scale, and an implicit cache both
  * evicts working memory the joins need and invites the reader to
  * assume it was sized to fit. Every corpus-derived frame that is
  * deliberately reused (dedup candidate generation, curation
  * pipelines, BPE round state) pins through [[Pin.corpus]] instead:
  * serialized blocks, memory while it lasts, disk after — the level
  * a 1000-executor run wants, stated where the reuse happens.
  *
  * Driver-bounded model state (centroids, codebooks) stays on
  * plain broadcast — this policy is only for data-sized frames.
  */
object Pin {
  /** MEMORY_AND_DISK_SER: serialized + spillable. */
  def corpus[T](ds: Dataset[T]): Dataset[T] =
    ds.persist(StorageLevel.MEMORY_AND_DISK_SER)
}
