package graft.tools

/** Shared local-FS helpers for the driver-contract mains and scratch
  * cleanup. One implementation of recursive delete — Verify's pre-run
  * stale-output sweep and Queries' exit-hook cleanup once carried two
  * near-identical copies, the drift hazard the JsonText consolidation
  * exists to prevent for escaping. */
object Fs {
  /** Best-effort recursive delete (idempotent; missing paths are a
    * no-op; failures are ignored — callers use this for hygiene, never
    * for correctness). */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }
}
