package graft.text

import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  test("detects major languages on natural sentences") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog and it was fine") == "en")
    assert(LangId.detect("der Hund ist nicht mit der Katze und das ist schön") == "de")
    assert(LangId.detect("el perro y el gato están en la casa que es un hogar") == "es")
    assert(LangId.detect("le chien est dans la maison et c'est une belle journée") == "fr")
    assert(LangId.detect("你好世界 这是一个测试") == "zh")
  }

  test("empty and garbage input fall back to unknown") {
    assert(LangId.detect("") == "unknown")
    assert(LangId.detect("12345 67890 %%% ###") == "unknown")
  }

  test("scores are deterministic pure functions") {
    val t = "the cat and the hat"
    assert(LangId.scores(t) == LangId.scores(t))
  }
}
