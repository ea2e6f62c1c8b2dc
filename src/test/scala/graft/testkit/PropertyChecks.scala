package graft.testkit

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic forAll over ScalaCheck Gen (the
  * scalatest↔scalacheck bridge artifact is not in the offline cache).
  */
trait PropertyChecks {
  protected val propertyIterations: Int = 100

  private def samples[A](g: Gen[A]): Iterator[A] =
    Iterator.from(0).map { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(
        throw new IllegalStateException("Gen failed to produce a value"))
    }

  def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga).take(propertyIterations).foreach(f)

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
}
