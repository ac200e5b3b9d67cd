package graft

/** Shared runtime defaults for the driver-contract mains. */
object Defaults {

  /** Worker-thread count: SPARK_GRAFT_CPUS, else the machine's cores
    * capped at 32 — one definition so all entrypoints agree. */
  def cpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)

  /** A working-column name guaranteed absent from `existing` (an input
    * that already carries e.g. `_rn` must survive unclobbered). Shared
    * by every operator that needs a transient column — Sessionize,
    * Sampling — so collision safety is one definition, not a
    * per-operator convention. */
  def freshCol(existing: Seq[String], base: String): String = {
    val taken = existing.toSet
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(!taken(_)).get
  }

  /** Temp directory that is recursively deleted at JVM exit — for
    * lifecycle queries that stage warehouses/exports per invocation
    * (a bench run invokes each of them several times; bare
    * createTempDirectory would accumulate gigabytes across runs). */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }
}
