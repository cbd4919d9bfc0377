package graft

/** Marks long-running soak/stress specs. Included in `sbt test` by
  * default; exclude with `testOnly -- -l graft.Slow` for a fast loop. */
object Slow extends org.scalatest.Tag("graft.Slow")
