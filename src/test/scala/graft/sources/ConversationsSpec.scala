package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ConversationsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("flatten keeps user/assistant turns in seq order per conversation") {
    // seqs deliberately out of row order; system/tool turns must drop
    // (reference rule: kg_gen.py:176-195)
    val msgs = Seq(
      (1L, 3L, "user", "Thanks!"),
      (1L, 0L, "user", "What is the capital of France?"),
      (1L, 2L, "system", "You are a helpful assistant."),
      (1L, 1L, "assistant", "The capital of France is Paris."),
      (1L, 4L, "tool", "noop"),
      (1L, 5L, "assistant", "You're welcome."),
      (2L, 1L, "assistant", "hi"),
      (2L, 0L, "user", "hello")
    ).toDF("conversation_id", "seq", "role", "content")

    val out = Conversations.flatten(msgs).as[(Long, String)].collect().toMap
    assert(out(1L) ==
      "user: What is the capital of France?\n" +
        "assistant: The capital of France is Paris.\n" +
        "user: Thanks!\n" +
        "assistant: You're welcome.")
    assert(out(2L) == "user: hello\nassistant: hi")
  }

  test("conversation with no kept roles produces no row (empty graph source)") {
    val msgs = Seq((9L, 0L, "system", "x")).toDF("conversation_id", "seq", "role", "content")
    assert(Conversations.flatten(msgs).count() == 0)
  }

  test("stats: per-role counts, content length, and role alternations") {
    val msgs = Seq(
      (1L, 1L, "user", "hi"),
      (1L, 2L, "assistant", "hello"),
      (1L, 3L, "assistant", "more"), // consecutive same role: no switch
      (1L, 4L, "user", "ok"),
      (1L, 5L, "system", "dropped"), // filtered before everything
      (2L, 1L, "user", "solo")
    ).toDF("conversation_id", "seq", "role", "content")
    val got = Conversations.stats(msgs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    // conv 1: 4 kept, 2/2 roles, 13 chars, switches u→a and a→u = 2;
    // conv 2: single turn, 0 switches
    assert(got == Set((1L, 4L, 2L, 2L, 13L, 2L), (2L, 1L, 1L, 0L, 4L, 0L)))
  }
}
