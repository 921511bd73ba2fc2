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
}
