package graft.textprep

import scala.collection.mutable.ArrayBuffer

/** Sentence-respecting greedy text chunker — a semantics-exact re-creation
  * of the reference's `chunk_text` (src/kg_gen/utils/chunk_text.py:17-66):
  *
  *   - sentences are packed greedily while
  *     `len(current) + len(sentence) + 1 <= maxChunkSize`
  *     (the `+1` accounts for the joining space);
  *   - a sentence longer than `maxChunkSize` falls back to word packing
  *     under the same `+1` rule (chunk_text.py:44-57);
  *   - every emitted chunk is `strip()`ed (chunk_text.py:39,52,57,64);
  *   - faithful quirks kept: a first word longer than `maxChunkSize - 1`
  *     pushes an empty chunk (chunk_text.py:49-53 appends
  *     `"".strip()`), and oversized single words become chunks longer
  *     than the limit — both reproduced bit-for-bit so the per-row
  *     invariant holds.
  *
  * Pure function — used from `Dataset.flatMap`; chunk parallelism is
  * partition parallelism (the reference's ThreadPoolExecutor at
  * src/kg_gen/kg_gen.py:227-231 maps to rows-in-partitions for free).
  */
object Chunker {

  val DefaultMaxChunkSize = 500 // reference default, chunk_text.py:17

  def chunk(text: String, maxChunkSize: Int = DefaultMaxChunkSize): Seq[String] = {
    val sentences = Sentences.split(text)
    val chunks = ArrayBuffer.empty[String]
    val current = new java.lang.StringBuilder

    for (sentence <- sentences) {
      if (current.length + sentence.length + 1 <= maxChunkSize) {
        current.append(sentence).append(' ')
      } else {
        if (current.length > 0) {
          chunks += current.toString.trim
          current.setLength(0)
        }
        if (sentence.length > maxChunkSize) {
          // word fallback — mirrors chunk_text.py:44-57 exactly,
          // including the possible empty first push.
          val words = sentence.split("\\s+").filter(_.nonEmpty)
          val temp = new java.lang.StringBuilder
          for (word <- words) {
            if (temp.length + word.length + 1 <= maxChunkSize) {
              temp.append(word).append(' ')
            } else {
              chunks += temp.toString.trim
              temp.setLength(0)
              temp.append(word).append(' ')
            }
          }
          if (temp.length > 0) chunks += temp.toString.trim
        } else {
          current.append(sentence).append(' ')
        }
      }
    }
    if (current.length > 0) chunks += current.toString.trim
    chunks.toSeq
  }
}
