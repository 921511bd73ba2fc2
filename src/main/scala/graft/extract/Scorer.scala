package graft.extract

import graft.model.Triple
import graft.textprep.Sentences

/** The engine's pluggable stand-in for the reference's LLM extraction
  * calls. The reference makes one schema-constrained structured-output
  * call per chunk for entities (src/kg_gen/steps/_1_get_entities.py:22-29)
  * and one for relations (src/kg_gen/steps/_2_get_relations.py:60-78);
  * here those become micro-batched scoring calls executed inside
  * `mapPartitions` (the north-star shape: "batched LLM-style mention
  * detection ... via mapPartitions with micro-batched scoring").
  *
  * A Scorer must be:
  *   - Serializable (shipped to executors),
  *   - deterministic per input (the correctness gate diffs exact sets),
  *   - batched: implementations amortize model/session setup across the
  *     `batchSize` chunks handed to each call.
  */
trait Scorer extends Serializable {

  /** Entity mentions for each chunk in the batch (aligned by index).
    * Reference: get_entities — one list[str] per chunk.
    */
  def entities(chunks: Seq[String], isConversation: Boolean): Seq[Seq[String]]

  /** Triples for each (chunk, chunkEntities) pair in the batch (aligned).
    * Reference: get_relations — subject/object constrained to the given
    * entity list.
    */
  def relations(
      batch: Seq[(String, Seq[String])],
      isConversation: Boolean
  ): Seq[Seq[Triple]]

  /** Combined per-batch extraction: (entities, valid triples) per chunk.
    * Default composes the two calls exactly as the reference does;
    * implementations that derive both from one parse should override
    * (the hot path — called from `Extract.extractions`).
    */
  def extract(chunks: Seq[String], isConversation: Boolean): Seq[(Seq[String], Seq[Triple])] = {
    val ents = entities(chunks, isConversation)
    val rels = relations(chunks.zip(ents), isConversation)
    ents.zip(rels)
  }
}

/** Context-steered scorer — the deterministic analogue of the
  * reference's `generate(context=...)` domain hint
  * (src/kg_gen/kg_gen.py:149-174 threads `context` into the relation
  * prompts, src/kg_gen/steps/_2_get_relations.py:6-39). An LLM is
  * *biased* by the hint; a deterministic engine needs a rule, so here
  * the hint is a token set that gates relations: a triple survives only
  * when its predicate shares a token with the context. Entities are
  * untouched (the reference's entity prompt takes the context too but
  * its tests only constrain relation output). Composes over any inner
  * scorer — steering is orthogonal to how scoring happens.
  */
final case class ContextScorer(inner: Scorer, context: String) extends Scorer {
  // Locale.ROOT: folding must not depend on the JVM's default locale
  // (tr/az locales fold 'I' to dotless ı and break the token match)
  private val ctxToks: Set[String] =
    context.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSet

  private def keep(t: Triple): Boolean =
    ctxToks.isEmpty ||
      t.predicate.toLowerCase(java.util.Locale.ROOT).split(" ").exists(ctxToks.contains)

  override def entities(chunks: Seq[String], isConversation: Boolean): Seq[Seq[String]] =
    inner.entities(chunks, isConversation)

  override def relations(
      batch: Seq[(String, Seq[String])],
      isConversation: Boolean
  ): Seq[Seq[Triple]] =
    inner.relations(batch, isConversation).map(_.filter(keep))

  override def extract(
      chunks: Seq[String],
      isConversation: Boolean
  ): Seq[(Seq[String], Seq[Triple])] =
    inner.extract(chunks, isConversation).map { case (e, r) => (e, r.filter(keep)) }
}

/** Deterministic pattern scorer — the inverse of the corpus renderer
  * (SURVEY.md §7.5 risk 2: the corpus is rendered *from* known graphs, so
  * extraction P/R measures pipeline correctness, not language
  * understanding).
  *
  * Rules, per sentence of the chunk:
  *   - an entity is a maximal run of Capitalized tokens (leading letter
  *     uppercase), surface form = tokens joined by single space,
  *     trailing sentence punctuation stripped;
  *   - a relation is (run_k, gap, run_k+1) for consecutive entity runs
  *     with a non-empty all-lowercase token gap, predicate = gap joined
  *     by single space;
  *   - conversation mode additionally detects "role: ..." line prefixes
  *     and emits the speaker as an entity plus (speaker, "says", FirstEntity)
  *     relations — the deterministic analogue of the reference's
  *     speaker-relation instruction (_2_get_relations.py:26-31).
  */
object PatternScorer extends Scorer {

  private def stripPunct(tok: String): String = {
    var e = tok.length
    while (e > 0 && {
        val c = tok.charAt(e - 1)
        c == '.' || c == '!' || c == '?' || c == ',' || c == ';'
      }) e -= 1
    if (e == tok.length) tok else tok.substring(0, e)
  }

  private def isCapitalized(tok: String): Boolean =
    tok.nonEmpty && Character.isUpperCase(tok.charAt(0))

  /** Whitespace-tokenize without regex (the extraction hot path runs on
    * every chunk of the corpus; a per-call Pattern.compile would dominate
    * the profile and its garbage caps multi-core scaling).
    */
  private def whitespaceToks(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Entity runs and the lowercase gaps between them for one sentence. */
  private def parseSentence(sentence: String): (Seq[String], Seq[Triple]) = {
    val toks = whitespaceToks(sentence).map(stripPunct).filter(_.nonEmpty)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)] // (surface, start, end)
    var i = 0
    while (i < toks.length) {
      if (isCapitalized(toks(i))) {
        var j = i
        while (j + 1 < toks.length && isCapitalized(toks(j + 1))) j += 1
        runs += ((toks.slice(i, j + 1).mkString(" "), i, j))
        i = j + 1
      } else i += 1
    }
    val triples = runs.toSeq.zip(runs.toSeq.drop(1)).flatMap {
      case ((s, _, sEnd), (o, oStart, _)) =>
        val gap = toks.slice(sEnd + 1, oStart)
        if (gap.nonEmpty && gap.forall(t => !isCapitalized(t)))
          Some(Triple(s, gap.mkString(" "), o))
        else None
    }
    (runs.toSeq.map(_._1), triples)
  }

  private def parseChunk(chunk: String, isConversation: Boolean): (Seq[String], Seq[Triple]) = {
    val lines = if (isConversation) chunk.split("\n").toSeq else Seq(chunk)
    val parts = lines.map { line =>
      val (speaker, body) =
        if (isConversation) {
          val idx = line.indexOf(": ")
          if (idx > 0 && Set("user", "assistant").contains(line.substring(0, idx)))
            (Some(line.substring(0, idx)), line.substring(idx + 2))
          else (None, line)
        } else (None, line)
      val sentenceResults = Sentences.split(body).map(parseSentence)
      val ents = sentenceResults.flatMap(_._1)
      val rels = sentenceResults.flatMap(_._2)
      speaker match {
        case Some(sp) =>
          val says = ents.headOption.map(e => Triple(sp, "says", e)).toSeq
          (sp +: ents, rels ++ says)
        case None => (ents, rels)
      }
    }
    (parts.flatMap(_._1).distinct, parts.flatMap(_._2).distinct)
  }

  override def entities(chunks: Seq[String], isConversation: Boolean): Seq[Seq[String]] =
    chunks.map(c => parseChunk(c, isConversation)._1)

  override def relations(
      batch: Seq[(String, Seq[String])],
      isConversation: Boolean
  ): Seq[Seq[Triple]] =
    batch.map { case (chunk, ents) =>
      val entitySet = ents.toSet
      // the reference's hard membership filter
      // (src/kg_gen/steps/_2_get_relations.py:101-105)
      parseChunk(chunk, isConversation)._2
        .filter(t => entitySet.contains(t.subject) && entitySet.contains(t.obj))
    }

  /** Hot path: one parse per chunk (entities() + relations() would parse
    * twice; results are identical because both derive from parseChunk).
    */
  override def extract(
      chunks: Seq[String],
      isConversation: Boolean
  ): Seq[(Seq[String], Seq[Triple])] =
    chunks.map { c =>
      val (ents, rels) = parseChunk(c, isConversation)
      val entitySet = ents.toSet
      (ents, rels.filter(t => entitySet.contains(t.subject) && entitySet.contains(t.obj)))
    }
}
