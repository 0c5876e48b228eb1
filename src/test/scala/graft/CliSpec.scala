package graft

import graft.cli.Main
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the CLI argument surface (`cli/Main.parse`) against the
  * reference's argparse definition (reference `main.py:28-40`) — including
  * its exact flag spellings, the snake_case forms, the `retweetted`
  * double-t typo, and the `--no-*` negative forms that
  * `argparse.BooleanOptionalAction` generates.
  */
class CliSpec extends AnyFunSuite {

  test("reference command line parses verbatim, including the retweetted typo") {
    // exactly as a reference user would type it (main.py:38 spells the
    // flag --only_tags_from_not_retweetted_posts)
    val a = Main.parse(Array(
      "tweets.jsonl",
      "--output_path", "out",
      "--save_full_graph",
      "--save_pbi_report",
      "--save_word_cloud",
      "--only_tags_from_not_retweetted_posts",
      "--jaccard_threshold", "0.25"))
    assert(a.inputFile == "tweets.jsonl")
    assert(a.outputPath == "out")
    assert(a.saveFullGraph && a.savePbiReport && a.saveWordCloud)
    assert(a.onlyTagsFromNotRetweetedPosts)
    assert(a.jaccardThreshold == 0.25)
  }

  test("corrected single-t spelling and dashed forms also parse") {
    val a = Main.parse(Array("t.jsonl", "--only-tags-from-not-retweeted-posts"))
    assert(a.onlyTagsFromNotRetweetedPosts)
  }

  test("BooleanOptionalAction --no-* forms negate, last one wins") {
    val a = Main.parse(Array(
      "t.jsonl",
      "--save_full_graph", "--no-save_full_graph",
      "--no-save_word_cloud", "--save_word_cloud",
      "--only_tags_from_not_retweetted_posts",
      "--no-only_tags_from_not_retweetted_posts"))
    assert(!a.saveFullGraph)
    assert(a.saveWordCloud)
    assert(!a.onlyTagsFromNotRetweetedPosts)
  }

  test("defaults match the reference's argparse defaults") {
    val a = Main.parse(Array("t.jsonl"))
    assert(!a.saveFullGraph && !a.savePbiReport && !a.saveWordCloud)
    assert(!a.onlyTagsFromNotRetweetedPosts)
    assert(a.jaccardThreshold == 0.5)
    assert(a.idNeighbours.isEmpty)
  }

  test("second positional is rejected like argparse") {
    val e = intercept[RuntimeException](Main.parse(Array("a.jsonl", "b.jsonl")))
    assert(e.getMessage.contains("unrecognized arguments"))
  }

  test("missing input file is rejected") {
    intercept[IllegalArgumentException](Main.parse(Array("--save_full_graph")))
  }
}
