package graft

/** Persist smoke-harness measurements as committed, diffable artifacts
  * (VERDICT r12 item 6): ScaleSmoke / StreamScaleSmoke print one JSON line
  * per invocation, which then survives only as prose quoted into PLANS.md.
  * This merges each invocation's per-query entries into ONE accumulating
  * JSON-object file (SCALE_FULL.json / STREAMSCALE_FULL.json — the
  * BENCH_FULL.json idiom), keyed `query@factorx`, so cross-round scale
  * regressions are a mechanical diff instead of an archaeology pass.
  */
object SmokeArtifact {

  /** Merge (key -> raw JSON value) entries into a one-line JSON object
    * file, preserving entries from prior invocations. The file is only
    * ever written by this code, so reading it back is a depth-aware
    * top-level split, not a general JSON parser — values are numbers or
    * flat objects, never deeper. */
  def merge(path: String, entries: Seq[(String, String)]): Unit = {
    val existing = scala.collection.mutable.LinkedHashMap[String, String]()
    val f = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(f)) {
      val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim
      // ABORT (never silently start fresh) when a non-empty existing file
      // fails the object-shape check — a truncated or hand-mangled artifact
      // means accumulated history would be discarded by a blind overwrite
      // (ADVICE r13). An empty file is a legitimate fresh start.
      if (s.nonEmpty && !(s.startsWith("{") && s.endsWith("}")))
        throw new IllegalStateException(
          s"$path exists but is not a JSON object (truncated write or hand " +
            "edit?) — refusing to overwrite accumulated smoke history. " +
            "Repair or delete the file, then re-run.")
      if (s.startsWith("{") && s.endsWith("}"))
        splitTopLevel(s.substring(1, s.length - 1)).foreach { part =>
          part.split(":", 2) match {
            case Array(k, v) =>
              val key = k.trim.stripPrefix("\"").stripSuffix("\"")
              if (key.nonEmpty) existing(key) = v.trim
            case _ => ()
          }
        }
    }
    entries.foreach { case (k, v) => existing(k) = v }
    val line = existing.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    // temp-file + atomic rename: a crash mid-write must never leave a
    // truncated artifact for the next invocation's guard to reject
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, f,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }

  /** Split a JSON object body at depth-0 commas (string-literal aware). */
  private def splitTopLevel(body: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var esc = false
    body.foreach { c =>
      if (esc) { esc = false; cur += c }
      else if (inStr) {
        if (c == '\\') esc = true else if (c == '"') inStr = false
        cur += c
      } else c match {
        case '"' => inStr = true; cur += c
        case '{' | '[' => depth += 1; cur += c
        case '}' | ']' => depth -= 1; cur += c
        case ',' if depth == 0 =>
          if (cur.nonEmpty) { parts += cur.toString; cur.clear() }
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq
  }
}
