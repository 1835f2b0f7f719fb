package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.file.{Files, Path}

/** Landing-side streaming splitter for OVERSIZED JSON-array deliveries
  * — the engine's analogue of the reference's ijson incremental parse
  * (app/processing/file_splitter.py:117-118, which streams a top-level
  * array in constant memory regardless of file size).
  *
  * Why it exists: Spark parses a `multiLine=true` JSON-array file in
  * ONE task — a multi-GB weekly delivery becomes a straggler or an
  * executor OOM (the r13 audit's "What's missing #1"). This splitter
  * makes one sequential, constant-memory pass over the landed bytes
  * and rewrites the array as JSONL shards at TOP-LEVEL ELEMENT
  * boundaries; the shards then parse as ordinary line-delimited JSON —
  * splittable, one task per shard, any file size. The pass is a byte-
  * level JSON structure machine (string/escape state + brace depth),
  * not a full parser: it never materializes an element, so memory is
  * the two 1 MiB stream buffers, exactly ijson's cost model.
  *
  * The machine validates STRUCTURE (balanced brackets/quotes, comma
  * placement, nothing outside the array), not full JSON grammar. Both
  * malformation classes still converge on the reference's whole-file
  * poison semantics (A17): a STRUCTURAL malformation aborts the split
  * (shards deleted, None returned) and the caller falls back to the
  * original single-task path, where the multiLine parse poisons the
  * file; a structurally-balanced but invalid element (`{"a":}`)
  * splits fine, fails record-level in its shard — and because shard
  * rows map back to the delivery's file_id (which lacks a .jsonl
  * suffix), the ingest poison rule fails the whole delivery, exactly
  * as the unsplit parse would have.
  * Newlines BETWEEN tokens inside an element are rewritten to spaces
  * (JSON structural whitespace — value-preserving) so each element is
  * one line; a raw newline INSIDE a string literal is already invalid
  * JSON and passes through to fail record-level in the shard.
  */
object ArraySplitter {

  /** Shard roll size: one shard ≈ one comfortable parse task. */
  val DefaultShardBytes: Long = 32L << 20

  /** Suffix pattern shard names carry; ingest strips it to recover the
    * original delivery's file_id, so control-table identity and the
    * upsert's file-name version ordering are split-invariant. */
  val ShardSuffixRe = "\\.gpart-\\d{5}\\.jsonl$"

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Split `src` (a top-level JSON array) into JSONL shards in
    * `dstDir`, named `<srcName>.gpart-NNNNN.jsonl`. Returns None —
    * with every partial shard deleted — on structural malformation;
    * Some(shards) otherwise (an empty array yields one empty shard, so
    * a delivery never vanishes from the control table). */
  def split(src: Path, dstDir: Path,
      shardBytes: Long = DefaultShardBytes): Option[Seq[Path]] = {
    val in = new BufferedInputStream(Files.newInputStream(src), 1 << 20)
    try doSplit(in, src.getFileName.toString, dstDir, shardBytes)
    finally in.close()
  }

  private final class Shards(base: String, dstDir: Path,
      shardBytes: Long) {
    private var idx = -1
    private var out: OutputStream = null
    private var written = 0L
    val paths = scala.collection.mutable.ArrayBuffer[Path]()
    def roll(): Unit = {
      closeCurrent()
      idx += 1
      val p = dstDir.resolve(f"$base.gpart-$idx%05d.jsonl")
      paths += p
      out = new BufferedOutputStream(Files.newOutputStream(p), 1 << 20)
      written = 0L
    }
    def maybeRoll(): Unit = if (written >= shardBytes) roll()
    def write(c: Int): Unit = { out.write(c); written += 1 }
    def closeCurrent(): Unit =
      if (out != null) { out.flush(); out.close(); out = null }
    def abort(): Unit = {
      closeCurrent()
      paths.foreach(Files.deleteIfExists(_))
    }
  }

  private def doSplit(in: InputStream, base: String, dstDir: Path,
      shardBytes: Long): Option[Seq[Path]] = {
    val sh = new Shards(base, dstDir, shardBytes)
    def malformed(): Option[Seq[Path]] = { sh.abort(); None }

    var c = in.read()
    while (c >= 0 && isWs(c)) c = in.read()
    if (c != '[') return malformed()
    sh.roll()

    var depth = 1
    var inString = false
    var escaped = false
    var inElement = false
    var pendingComma = false
    var closed = false

    def startElement(): Unit = {
      inElement = true
      pendingComma = false
      sh.maybeRoll() // roll only BETWEEN elements — a record never splits
    }
    def endElement(): Unit = {
      inElement = false
      sh.write('\n')
    }

    c = in.read()
    while (c >= 0 && !closed) {
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
        sh.write(c)
      } else if (c == '"') {
        if (!inElement) startElement()
        inString = true
        sh.write(c)
      } else if (c == '{' || c == '[') {
        if (!inElement) startElement()
        depth += 1
        sh.write(c)
      } else if (c == '}') {
        if (!inElement || depth <= 1) return malformed()
        depth -= 1
        sh.write(c)
      } else if (c == ']') {
        depth -= 1
        if (depth == 0) {
          if (inElement) endElement()
          else if (pendingComma) return malformed() // [1,]
          closed = true
        } else {
          sh.write(c)
        }
      } else if (c == ',') {
        if (depth == 1) {
          if (!inElement) return malformed() // [, or ,,
          endElement()
          pendingComma = true
        } else {
          sh.write(c)
        }
      } else if (isWs(c)) {
        // depth-1 ws inside an element is always TRAILING (no valid
        // JSON value has internal ws at the top of its own nesting),
        // so skipping it keeps shard lines clean of trailing blanks
        if (inElement && depth > 1)
          sh.write(if (c == '\n' || c == '\r') ' ' else c)
      } else {
        if (!inElement) startElement()
        sh.write(c)
      }
      c = in.read()
    }
    if (!closed) return malformed() // EOF inside the array
    c = in.read()
    while (c >= 0 && isWs(c)) c = in.read()
    if (c >= 0) return malformed() // bytes after the closing ]
    sh.closeCurrent()
    Some(sh.paths.toSeq)
  }
}
